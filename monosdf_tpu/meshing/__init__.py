from .marching import marching_tetrahedra
from .extract import extract_mesh, sdf_grid_eval
from .ply import write_ply, read_ply
