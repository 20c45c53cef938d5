"""Minimal binary PLY writer/reader (replaces the reference's trimesh export,
plots.py:222-226)."""

from __future__ import annotations

import numpy as np


def write_ply(path: str, verts: np.ndarray, faces: np.ndarray | None = None):
    verts = np.asarray(verts, np.float32)
    n_f = 0 if faces is None else len(faces)
    header = [
        "ply",
        "format binary_little_endian 1.0",
        f"element vertex {len(verts)}",
        "property float x",
        "property float y",
        "property float z",
        f"element face {n_f}",
        "property list uchar int vertex_indices",
        "end_header",
    ]
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        f.write(verts.astype("<f4").tobytes())
        if faces is not None and n_f:
            faces = np.asarray(faces, np.int32)
            rec = np.empty(
                n_f, dtype=[("n", "u1"), ("idx", "<i4", (3,))]
            )
            rec["n"] = 3
            rec["idx"] = faces
            f.write(rec.tobytes())


def read_ply(path: str):
    """Reads PLYs written by write_ply (binary LE, xyz float + tri faces)."""
    with open(path, "rb") as f:
        n_v = n_f = 0
        props = []
        while True:
            line = f.readline().decode().strip()
            if line.startswith("element vertex"):
                n_v = int(line.split()[-1])
            elif line.startswith("element face"):
                n_f = int(line.split()[-1])
            elif line.startswith("property float"):
                props.append(line.split()[-1])
            elif line == "end_header":
                break
        n_props = max(3, len(props))
        verts = np.frombuffer(f.read(4 * n_props * n_v), "<f4").reshape(n_v, n_props)[:, :3]
        faces = None
        if n_f:
            rec = np.frombuffer(
                f.read(n_f * (1 + 12)), dtype=[("n", "u1"), ("idx", "<i4", (3,))]
            )
            faces = rec["idx"].copy()
    return verts.copy(), faces
