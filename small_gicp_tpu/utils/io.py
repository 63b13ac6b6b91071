"""Point-cloud file IO (host side, numpy).

Covers the reference's minimal PLY reader/writer and KITTI float4 .bin
loader (reference: include/small_gicp/benchmark/read_points.hpp:15-109).
Unlike the reference's float-only PLY parser, this one handles ascii and
binary_little_endian with arbitrary scalar vertex properties, picking out
x/y/z (and optional nx/ny/nz).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

_PLY_DTYPES = {
    "char": "i1",
    "int8": "i1",
    "uchar": "u1",
    "uint8": "u1",
    "short": "i2",
    "int16": "i2",
    "ushort": "u2",
    "uint16": "u2",
    "int": "i4",
    "int32": "i4",
    "uint": "u4",
    "uint32": "u4",
    "float": "f4",
    "float32": "f4",
    "double": "f8",
    "float64": "f8",
}


def read_ply(path: str, return_normals: bool = False):
    """Read a PLY file, returning [N,3] float32 xyz (and optional normals).

    Equivalent surface to the reference's read_ply
    (benchmark/read_points.hpp:52-77, exposed to Python via misc.cpp:19-26).
    """
    with open(path, "rb") as f:
        magic = f.readline().strip()
        if magic != b"ply":
            raise ValueError(f"{path} is not a PLY file")
        fmt = None
        n_vertex = None
        props = []  # (name, numpy dtype str) for the vertex element
        in_vertex = False
        while True:
            line = f.readline()
            if not line:
                raise ValueError("unexpected EOF in PLY header")
            tokens = line.decode("ascii", "replace").strip().split()
            if not tokens:
                continue
            if tokens[0] == "format":
                fmt = tokens[1]
            elif tokens[0] == "element":
                in_vertex = tokens[1] == "vertex"
                if in_vertex:
                    n_vertex = int(tokens[2])
            elif tokens[0] == "property" and in_vertex:
                if tokens[1] == "list":
                    raise ValueError("list properties on vertex element unsupported")
                props.append((tokens[2], _PLY_DTYPES[tokens[1]]))
            elif tokens[0] == "end_header":
                break

        if fmt is None or n_vertex is None:
            raise ValueError("malformed PLY header")
        names = [p[0] for p in props]
        if fmt == "binary_little_endian":
            dtype = np.dtype([(n, "<" + d) for n, d in props])
            data = np.frombuffer(f.read(dtype.itemsize * n_vertex), dtype=dtype)
        elif fmt == "binary_big_endian":
            dtype = np.dtype([(n, ">" + d) for n, d in props])
            data = np.frombuffer(f.read(dtype.itemsize * n_vertex), dtype=dtype)
        elif fmt == "ascii":
            dtype = np.dtype([(n, d) for n, d in props])
            rows = np.loadtxt(f, max_rows=n_vertex, ndmin=2)
            data = np.core.records.fromarrays(rows.T, dtype=dtype)
        else:
            raise ValueError(f"unsupported PLY format {fmt}")

    xyz = np.stack(
        [data["x"], data["y"], data["z"]], axis=1
    ).astype(np.float32)
    if return_normals:
        if all(n in names for n in ("nx", "ny", "nz")):
            normals = np.stack(
                [data["nx"], data["ny"], data["nz"]], axis=1
            ).astype(np.float32)
        else:
            normals = None
        return xyz, normals
    return xyz


def write_ply(path: str, points: np.ndarray, normals: Optional[np.ndarray] = None):
    """Write a binary_little_endian PLY (reference: read_points.hpp:80-109)."""
    points = np.asarray(points, dtype=np.float32)
    fields = [("x", "<f4"), ("y", "<f4"), ("z", "<f4")]
    if normals is not None:
        normals = np.asarray(normals, dtype=np.float32)
        fields += [("nx", "<f4"), ("ny", "<f4"), ("nz", "<f4")]
    rec = np.zeros(points.shape[0], dtype=np.dtype(fields))
    rec["x"], rec["y"], rec["z"] = points[:, 0], points[:, 1], points[:, 2]
    if normals is not None:
        rec["nx"], rec["ny"], rec["nz"] = normals[:, 0], normals[:, 1], normals[:, 2]
    with open(path, "wb") as f:
        f.write(b"ply\n")
        f.write(b"format binary_little_endian 1.0\n")
        f.write(f"element vertex {points.shape[0]}\n".encode())
        for name, _ in fields:
            f.write(f"property float {name}\n".encode())
        f.write(b"end_header\n")
        f.write(rec.tobytes())


def read_kitti_bin(path: str) -> np.ndarray:
    """Load a KITTI velodyne scan: float32 x,y,z,intensity → [N,3] xyz
    (reference: benchmark/read_points.hpp:15-46)."""
    raw = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    return raw[:, :3].copy()


def write_kitti_bin(path: str, points_xyz: np.ndarray) -> None:
    """Write a KITTI velodyne scan: [N,3] xyz → float32 x,y,z,intensity
    rows (intensity 0) — the inverse of read_kitti_bin, used to dump
    synthetic sequences into the same on-disk format the reference's
    KittiDataset consumes (benchmark/benchmark.hpp:96-144)."""
    pts = np.asarray(points_xyz, np.float32)
    raw = np.zeros((pts.shape[0], 4), np.float32)
    raw[:, :3] = pts[:, :3]
    raw.tofile(path)


def list_kitti_scans(directory: str):
    """Sorted list of *.bin scan paths (reference: benchmark.hpp:98-110)."""
    names = sorted(n for n in os.listdir(directory) if n.endswith(".bin"))
    return [os.path.join(directory, n) for n in names]


def read_pose_matrix(path: str) -> np.ndarray:
    """Read a whitespace 4x4 (or 3x4) pose matrix (data/T_target_source.txt)."""
    m = np.loadtxt(path)
    if m.shape == (3, 4):
        m = np.vstack([m, [0.0, 0.0, 0.0, 1.0]])
    if m.shape != (4, 4):
        raise ValueError(f"expected 4x4 pose, got {m.shape}")
    return m
