"""Mesh I/O and normals."""
import numpy as np

from future_urban_scene_generation_tpu.utils import mesh as mu


def test_ply_ascii_round_trip(tmp_path):
    mesh, _ = mu.make_test_car()
    path = tmp_path / "car.ply"
    mu.save_ply_ascii(path, mesh)
    loaded = mu.load_ply(path)
    assert np.allclose(loaded.vertices, mesh.vertices, atol=1e-5)
    assert np.array_equal(loaded.triangles, mesh.triangles)


def test_ply_binary(tmp_path):
    import struct

    mesh, _ = mu.make_test_car(subdiv=1)
    path = tmp_path / "car_bin.ply"
    with open(path, "wb") as f:
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {len(mesh.vertices)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element face {len(mesh.triangles)}\n"
            "property list uchar int vertex_indices\nend_header\n"
        )
        f.write(header.encode())
        for v in mesh.vertices:
            f.write(struct.pack("<fff", *v))
        for t in mesh.triangles:
            f.write(struct.pack("<Biii", 3, *t))
    loaded = mu.load_ply(path)
    assert np.allclose(loaded.vertices, mesh.vertices, atol=1e-5)
    assert np.array_equal(loaded.triangles, mesh.triangles)


def test_quad_face_triangulation(tmp_path):
    path = tmp_path / "quad.ply"
    path.write_text(
        "ply\nformat ascii 1.0\nelement vertex 4\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 1\nproperty list uchar int vertex_indices\nend_header\n"
        "0 0 0\n1 0 0\n1 1 0\n0 1 0\n"
        "4 0 1 2 3\n"
    )
    mesh = mu.load_ply(path)
    assert mesh.triangles.shape == (2, 3)  # fan-triangulated


def test_vertex_normals_unit_cube():
    mesh, _ = mu.make_test_car(subdiv=1)
    normals = mu.compute_vertex_normals(mesh)
    lens = np.linalg.norm(normals, axis=1)
    assert np.allclose(lens, 1.0, atol=1e-6)


def test_keypoints_inside_mesh_bounds():
    mesh, kp3d = mu.make_test_car()
    lo, hi = mesh.vertices.min(0) - 1e-6, mesh.vertices.max(0) + 1e-6
    assert np.all(kp3d >= lo) and np.all(kp3d <= hi)


def test_orient_for_backface_cull_closed_and_open():
    mesh, _ = mu.make_test_car(subdiv=3)
    oriented, cullable = mu.orient_for_backface_cull(mesh)
    assert cullable
    # Outward orientation: total signed volume positive, and per-triangle the
    # winding differs from the input only by even/odd corner swaps.
    v = oriented.vertices
    t = oriented.triangles
    vol = np.einsum(
        "ij,ij->i", v[t[:, 0]], np.cross(v[t[:, 1]], v[t[:, 2]])
    ).sum() / 6.0
    assert vol > 0.0
    assert sorted(map(tuple, np.sort(t, 1))) == sorted(
        map(tuple, np.sort(mesh.triangles, 1))
    )

    # An open surface (single quad patch) must be rejected.
    quad = mu.TriangleMesh(
        np.array([[0.0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]]),
        np.array([[0, 1, 2], [0, 2, 3]], np.int32),
    )
    _, cullable = mu.orient_for_backface_cull(quad)
    assert not cullable
