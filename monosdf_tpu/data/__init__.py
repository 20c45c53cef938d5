from .synthetic import make_synthetic_sphere_scene, sample_ray_batch
from .scene_dataset import DatasetConfig, SceneDataset
