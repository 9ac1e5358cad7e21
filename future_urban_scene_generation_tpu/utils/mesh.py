"""Triangle-mesh I/O and geometry utilities (host-side, numpy).

Replaces the reference's Open3D dependency for CAD assets: a self-contained PLY reader
(ascii + binary little-endian) standing in for o3d.io.read_triangle_mesh
(utils/cad_utils.py:21), vertex-normal computation matching Open3D's
ComputeVertexNormals (normalize the per-face cross products, average per vertex,
normalize), and a procedural car-like box mesh for tests and demos (the real Pascal3D+
CAD .ply assets are external downloads in the reference too, README.md:56-60).
"""
from __future__ import annotations

import struct
from dataclasses import dataclass
from pathlib import Path
from typing import Tuple

import numpy as np

from future_urban_scene_generation_tpu.utils import keypoints as kp


@dataclass
class TriangleMesh:
    vertices: np.ndarray  # (V, 3) float64
    triangles: np.ndarray  # (T, 3) int32

    def with_vertices(self, vertices: np.ndarray) -> "TriangleMesh":
        return TriangleMesh(np.asarray(vertices, np.float64), self.triangles)


def compute_vertex_normals(mesh: TriangleMesh) -> np.ndarray:
    """Open3D-style vertex normals: average of unit face normals, renormalized."""
    v = mesh.vertices
    t = mesh.triangles
    fn = np.cross(v[t[:, 1]] - v[t[:, 0]], v[t[:, 2]] - v[t[:, 0]])
    norms = np.linalg.norm(fn, axis=1, keepdims=True)
    fn = fn / np.maximum(norms, 1e-12)
    vn = np.zeros_like(v)
    for c in range(3):
        np.add.at(vn, t[:, c], fn)
    vn_norm = np.linalg.norm(vn, axis=1, keepdims=True)
    return vn / np.maximum(vn_norm, 1e-12)


def spatial_sort_triangles(mesh: TriangleMesh) -> TriangleMesh:
    """Reorder triangles along a Morton (Z-order) curve of their centroids.

    Rigid projection preserves neighborhoods, so model-space locality gives
    screen-space locality for any pose: consecutive triangles land in nearby
    screen tiles, which makes the Pallas rasterizer's per-chunk screen bboxes
    tight and lets whole 128-triangle chunks skip tiles they don't touch
    (ops/pallas_raster.py). Identity on the rendered image up to depth-tie
    order between distinct coincident triangles.
    """
    v = np.asarray(mesh.vertices, np.float64)
    t = np.asarray(mesh.triangles, np.int64)
    if len(t) == 0:
        return mesh
    cent = (v[t[:, 0]] + v[t[:, 1]] + v[t[:, 2]]) / 3.0
    lo = cent.min(0)
    span = np.maximum(cent.max(0) - lo, 1e-12)
    q = np.minimum((cent - lo) / span * 1024.0, 1023.0).astype(np.uint64)

    def _spread(x):  # interleave bits with two zero gaps (10 -> 30 bits)
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x

    code = _spread(q[:, 0]) | (_spread(q[:, 1]) << np.uint64(1)) | (
        _spread(q[:, 2]) << np.uint64(2)
    )
    order = np.argsort(code, kind="stable")
    return TriangleMesh(mesh.vertices, np.asarray(mesh.triangles)[order])


_PLY_TYPES = {
    "char": ("b", 1), "int8": ("b", 1),
    "uchar": ("B", 1), "uint8": ("B", 1),
    "short": ("h", 2), "int16": ("h", 2),
    "ushort": ("H", 2), "uint16": ("H", 2),
    "int": ("i", 4), "int32": ("i", 4),
    "uint": ("I", 4), "uint32": ("I", 4),
    "float": ("f", 4), "float32": ("f", 4),
    "double": ("d", 8), "float64": ("d", 8),
}


def load_ply(path) -> TriangleMesh:
    """Minimal PLY triangle-mesh reader (ascii / binary_little_endian)."""
    data = Path(path).read_bytes()
    header_end = data.find(b"end_header\n")
    if header_end < 0:
        raise ValueError(f"{path}: not a PLY file (no end_header)")
    header = data[:header_end].decode("ascii", errors="replace").splitlines()
    body = data[header_end + len(b"end_header\n"):]

    if not header or header[0].strip() != "ply":
        raise ValueError(f"{path}: missing 'ply' magic")
    fmt = None
    elements = []  # list of (name, count, properties); properties: (name, type) or ('list', count_t, item_t, name)
    for line in header[1:]:
        tok = line.strip().split()
        if not tok or tok[0] == "comment":
            continue
        if tok[0] == "format":
            fmt = tok[1]
        elif tok[0] == "element":
            elements.append((tok[1], int(tok[2]), []))
        elif tok[0] == "property":
            if tok[1] == "list":
                elements[-1][2].append(("list", tok[2], tok[3], tok[4]))
            else:
                elements[-1][2].append((tok[2], tok[1]))  # (name, type)
    if fmt not in ("ascii", "binary_little_endian"):
        raise ValueError(f"{path}: unsupported PLY format {fmt}")

    vertices = None
    faces = []
    if fmt == "ascii":
        lines = body.decode("ascii").split("\n")
        cursor = 0
        for name, count, props in elements:
            rows = lines[cursor: cursor + count]
            cursor += count
            if name == "vertex":
                vals = np.array([r.split()[: len(props)] for r in rows], dtype=np.float64)
                names = [p[0] for p in props]
                vertices = vals[:, [names.index("x"), names.index("y"), names.index("z")]]
            elif name == "face":
                for r in rows:
                    nums = r.split()
                    n = int(nums[0])
                    idx = list(map(int, nums[1 : 1 + n]))
                    for k3 in range(1, n - 1):  # fan-triangulate
                        faces.append((idx[0], idx[k3], idx[k3 + 1]))
    else:
        offset = 0
        for name, count, props in elements:
            if name == "vertex":
                dt = np.dtype(
                    [(p[0], "<" + _PLY_TYPES[p[1]][0]) for p in props]
                )
                arr = np.frombuffer(body, dtype=dt, count=count, offset=offset)
                offset += dt.itemsize * count
                vertices = np.stack(
                    [arr[ax].astype(np.float64) for ax in ("x", "y", "z")], axis=1
                )
            elif name == "face":
                (prop,) = props  # single list property expected
                _, count_t, item_t, _ = prop
                cfmt, csz = _PLY_TYPES[count_t]
                ifmt, isz = _PLY_TYPES[item_t]
                for _ in range(count):
                    (n,) = struct.unpack_from("<" + cfmt, body, offset)
                    offset += csz
                    idx = struct.unpack_from("<" + str(n) + ifmt, body, offset)
                    offset += isz * n
                    for k3 in range(1, n - 1):
                        faces.append((idx[0], idx[k3], idx[k3 + 1]))
            else:
                # Skip unknown fixed-size elements.
                fmt_str = "<" + "".join(_PLY_TYPES[p[1]][0] for p in props)
                offset += struct.calcsize(fmt_str) * count

    if vertices is None:
        raise ValueError(f"{path}: no vertex element")
    return TriangleMesh(vertices, np.asarray(faces, np.int32))


def save_ply_ascii(path, mesh: TriangleMesh):
    """Write an ascii PLY (for tests and asset generation)."""
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(mesh.vertices)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(mesh.triangles)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in mesh.vertices:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for t in mesh.triangles:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")


def load_cad_with_keypoints(cad_root, cad_idx: int, pascal_class: str = "car"):
    """Load pascal_{class}_cad_{idx:03d}.ply + its .yaml 3D keypoints
    (utils/cad_utils.py:8-26). Returns (TriangleMesh, (12, 3) keypoint array)."""
    import yaml

    cad_root = Path(cad_root)
    ply_path = cad_root / f"pascal_{pascal_class}_cad_{cad_idx:03d}.ply"
    mesh = load_ply(ply_path)
    yaml_path = ply_path.with_suffix(".yaml")
    with open(yaml_path) as f:
        kp3d_dict = yaml.safe_load(f)["kpoints_3d"]
    return mesh, kp.dict_to_array(kp3d_dict, dim=3)


def make_test_car(
    length: float = 1.0, width: float = 0.42, height: float = 0.3, subdiv: int = 3
) -> Tuple[TriangleMesh, np.ndarray]:
    """Procedural car-like mesh (box body + cabin wedge) with plausible 12 keypoints
    in the canonical order, in a Pascal3D-like vehicle frame (x: rear->front along
    -y in the reference's convention... here: +x forward, +y left, +z up, centered).

    Used by tests and the synthetic-scene demo in place of the downloadable CAD set.
    Scale by 5 like run_test.py:148-151 to get a ~5 m vehicle.
    """
    hl, hw_, hh = length / 2, width / 2, height / 2
    cab_h = height * 0.55
    boxes = [
        # (x0, x1, y0, y1, z0, z1)
        (-hl, hl, -hw_, hw_, -hh, hh * 0.2),  # body
        (-hl * 0.55, hl * 0.35, -hw_ * 0.92, hw_ * 0.92, hh * 0.2, hh * 0.2 + cab_h),  # cabin
    ]
    verts = []
    tris = []
    for (x0, x1, y0, y1, z0, z1) in boxes:
        base = len(verts)
        n = subdiv + 1
        # 6 faces, each an n x n grid for some geometric detail.
        for axis, sign in ((0, -1), (0, 1), (1, -1), (1, 1), (2, -1), (2, 1)):
            face_base = len(verts)
            us = np.linspace(0, 1, n)
            for ui in us:
                for vi in us:
                    if axis == 0:
                        x = x0 if sign < 0 else x1
                        p = (x, y0 + ui * (y1 - y0), z0 + vi * (z1 - z0))
                    elif axis == 1:
                        y = y0 if sign < 0 else y1
                        p = (x0 + ui * (x1 - x0), y, z0 + vi * (z1 - z0))
                    else:
                        z = z0 if sign < 0 else z1
                        p = (x0 + ui * (x1 - x0), y0 + vi * (y1 - y0), z)
                    verts.append(p)
            for i in range(subdiv):
                for j in range(subdiv):
                    a = face_base + i * n + j
                    b = a + 1
                    c = a + n
                    d = c + 1
                    if sign > 0:
                        tris += [(a, c, b), (b, c, d)]
                    else:
                        tris += [(a, b, c), (b, d, c)]
        del base
    mesh = TriangleMesh(np.asarray(verts, np.float64), np.asarray(tris, np.int32))

    z_wheel = -hh
    z_light = 0.0
    z_top = hh * 0.2 + cab_h
    keypoints = np.array(
        [
            [-hl, hw_, z_light],  # left_back_trunk
            [-hl * 0.8, hw_, z_wheel],  # left_back_wheel
            [hl, hw_ * 0.9, z_light],  # left_front_light
            [hl * 0.8, hw_, z_wheel],  # left_front_wheel
            [-hl, -hw_, z_light],  # right_back_trunk
            [-hl * 0.8, -hw_, z_wheel],  # right_back_wheel
            [hl, -hw_ * 0.9, z_light],  # right_front_light
            [hl * 0.8, -hw_, z_wheel],  # right_front_wheel
            [-hl * 0.55, hw_ * 0.92, z_top],  # upper_left_rearwindow
            [hl * 0.35, hw_ * 0.92, z_top],  # upper_left_windshield
            [-hl * 0.55, -hw_ * 0.92, z_top],  # upper_right_rearwindow
            [hl * 0.35, -hw_ * 0.92, z_top],  # upper_right_windshield
        ]
    )
    return mesh, keypoints
