"""Z-buffer rasterizer: geometric correctness tests (no Open3D available as oracle)."""
import numpy as np
import jax
import jax.numpy as jnp

from future_urban_scene_generation_tpu.render import rasterizer as rz
from future_urban_scene_generation_tpu.utils import mesh as mesh_utils


def test_single_triangle_coverage_and_color():
    verts = jnp.asarray([[10.0, 10.0, 5.0], [50.0, 10.0, 5.0], [10.0, 50.0, 5.0]])
    tris = jnp.asarray([[0, 1, 2]], jnp.int32)
    colors = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    img, bg = rz.rasterize(verts, tris, colors, (64, 64))
    img, bg = np.asarray(img), np.asarray(bg)
    assert not bg[20, 20] and bg[60, 60] and bg[5, 5]
    # Vertex corners carry their colors.
    assert img[11, 11, 0] > 0.8  # near v0: red
    assert img[11, 48, 1] > 0.8  # near v1: green
    assert img[48, 11, 2] > 0.8  # near v2: blue
    # Barycentric sum: channels add to ~1 inside.
    inside = ~bg
    sums = img.sum(-1)[inside]
    assert np.allclose(sums, 1.0, atol=1e-4)


def test_zbuffer_order():
    # Far red quad behind near green quad; overlap shows green.
    verts = jnp.asarray(
        [
            [5.0, 5.0, 10.0], [60.0, 5.0, 10.0], [5.0, 60.0, 10.0], [60.0, 60.0, 10.0],
            [20.0, 20.0, 4.0], [45.0, 20.0, 4.0], [20.0, 45.0, 4.0], [45.0, 45.0, 4.0],
        ]
    )
    tris = jnp.asarray([[0, 1, 2], [1, 3, 2], [4, 5, 6], [5, 7, 6]], jnp.int32)
    colors = jnp.asarray([[1.0, 0, 0]] * 4 + [[0, 1.0, 0]] * 4)
    img, bg = rz.rasterize(verts, tris, colors, (64, 64))
    img = np.asarray(img)
    assert img[30, 30, 1] > 0.9 and img[30, 30, 0] < 0.1  # overlap -> green
    assert img[10, 10, 0] > 0.9  # outside near quad -> red


def test_behind_camera_culled():
    verts = jnp.asarray([[10.0, 10.0, -5.0], [50.0, 10.0, -5.0], [10.0, 50.0, -5.0]])
    tris = jnp.asarray([[0, 1, 2]], jnp.int32)
    colors = jnp.ones((3, 3))
    _, bg = rz.rasterize(verts, tris, colors, (64, 64))
    assert np.asarray(bg).all()


def test_chunk_padding_invariance():
    rng = np.random.RandomState(14)
    verts = jnp.asarray(rng.rand(30, 3) * [60, 60, 0] + [0, 0, 5], jnp.float32)
    tris = jnp.asarray(rng.randint(0, 30, (37, 3)), jnp.int32)  # 37 % 128 != 0
    colors = jnp.asarray(rng.rand(30, 3), jnp.float32)
    img_a, bg_a = rz.rasterize(verts, tris, colors, (64, 64), chunk=128)
    img_b, bg_b = rz.rasterize(verts, tris, colors, (64, 64), chunk=16)
    assert np.array_equal(np.asarray(bg_a), np.asarray(bg_b))
    assert np.abs(np.asarray(img_a) - np.asarray(img_b)).max() < 1e-5


def test_normal_sketch_of_test_car():
    mesh, kp3d = mesh_utils.make_test_car()
    mesh = mesh.with_vertices(mesh.vertices * 5.0)  # reference x5 scale
    normals = mesh_utils.compute_vertex_normals(mesh)

    k_mat = jnp.asarray([[800.0, 0, 128], [0, 800.0, 128], [0, 0, 1]])
    cam = rz.Camera.from_intrinsic(k_mat)
    # Camera looking at the car from the front-left, 12 m away.
    from future_urban_scene_generation_tpu.geometry.rotations import x_rot, z_rot

    r_wc = np.asarray(x_rot(jnp.float32(-np.pi / 2.5)) @ z_rot(jnp.float32(0.6)))
    ext = np.eye(4, dtype=np.float32)
    ext[:3, :3] = r_wc
    ext[:3, 3] = [0, 0.5, 12.0]

    sketch, bg = jax.jit(
        lambda v, t, n, e: rz.render_normal_sketch(v, t, n, e, cam, (256, 256))
    )(
        jnp.asarray(mesh.vertices, jnp.float32),
        jnp.asarray(mesh.triangles),
        jnp.asarray(normals, jnp.float32),
        jnp.asarray(ext),
    )
    sketch, bg = np.asarray(sketch), np.asarray(bg)
    cover = (~bg).mean()
    assert 0.05 < cover < 0.9, cover  # car occupies a sensible fraction
    vals = sketch[~bg]
    assert vals.min() >= 0.0 and vals.max() <= 1.0
    assert vals.std() > 0.05  # normals vary across faces
    # Background exactly black (mask convention render_open3d.py:48).
    assert np.all(sketch[bg] == 0.0)


def test_crop_camera_consistency():
    # Rendering with a crop camera == cropping a full-frame render (up to resampling).
    mesh, _ = mesh_utils.make_test_car()
    mesh = mesh.with_vertices(mesh.vertices * 5.0)
    normals = mesh_utils.compute_vertex_normals(mesh)
    k_mat = jnp.asarray([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    cam_full = rz.Camera.from_intrinsic(k_mat)
    ext = np.eye(4, dtype=np.float32)
    ext[:3, :3] = np.asarray(
        jnp.asarray([[1, 0, 0], [0, 0, -1], [0, 1, 0]], jnp.float32)
    )
    ext[:3, 3] = [0, 1.0, 14.0]

    args = (
        jnp.asarray(mesh.vertices, jnp.float32),
        jnp.asarray(mesh.triangles),
        jnp.asarray(normals, jnp.float32),
        jnp.asarray(ext),
    )
    full, bg_full = rz.render_normal_sketch(*args, cam_full, (480, 640))
    ys, xs = np.nonzero(~np.asarray(bg_full))
    x0, y0 = xs.min(), ys.min()
    side = max(xs.max() - x0, ys.max() - y0) + 2
    cam_crop = cam_full.crop(jnp.float32(x0), jnp.float32(y0), jnp.float32(128.0 / side))
    crop, bg_crop = rz.render_normal_sketch(*args, cam_crop, (128, 128))
    cover_crop = (~np.asarray(bg_crop)).mean()
    # Vehicle fills a large part of the crop window.
    assert cover_crop > 0.2, cover_crop


def test_rasterize_corners_matches_indexed():
    # XLA fallback: the corner-expanded entry is the indexed entry minus the
    # per-render gathers — identical output, including background mask.
    rng = np.random.RandomState(7)
    verts = jnp.asarray(rng.rand(40, 3) * [60, 60, 3] + [0, 0, 4], jnp.float32)
    tris = jnp.asarray(rng.randint(0, 40, (37, 3)), jnp.int32)
    colors = jnp.asarray(rng.rand(40, 3), jnp.float32)
    img_i, bg_i = rz.rasterize(verts, tris, colors, (64, 64))
    v, t, c = np.asarray(verts), np.asarray(tris), np.asarray(colors)
    screen = jnp.asarray(np.stack([v[t[:, 0]].T, v[t[:, 1]].T, v[t[:, 2]].T]))
    rgb = jnp.asarray(np.stack([c[t[:, 0]].T, c[t[:, 1]].T, c[t[:, 2]].T]))
    img_c, bg_c = rz.rasterize_corners(screen, rgb, (64, 64))
    assert np.array_equal(np.asarray(bg_i), np.asarray(bg_c))
    assert np.abs(np.asarray(img_i) - np.asarray(img_c)).max() < 1e-6


def test_normal_sketch_corners_matches_indexed():
    # The CadBank corner expansion (world-space verts/normals indexed per
    # corner, lane-major) through render_normal_sketch_corners must match the
    # indexed render_normal_sketch path end to end.
    mesh, _ = mesh_utils.make_test_car()
    mesh = mesh.with_vertices(mesh.vertices * 5.0)
    normals = mesh_utils.compute_vertex_normals(mesh)
    k_mat = jnp.asarray([[800.0, 0, 128], [0, 800.0, 128], [0, 0, 1]])
    cam = rz.Camera.from_intrinsic(k_mat)
    from future_urban_scene_generation_tpu.geometry.rotations import x_rot, z_rot

    ext = np.eye(4, dtype=np.float32)
    ext[:3, :3] = np.asarray(x_rot(jnp.float32(-np.pi / 2.5)) @ z_rot(jnp.float32(0.6)))
    ext[:3, 3] = [0, 0.5, 12.0]

    v = np.float32(mesh.vertices)
    t = np.asarray(mesh.triangles)
    n = np.float32(normals)
    img_i, bg_i = rz.render_normal_sketch(
        jnp.asarray(v), jnp.asarray(t), jnp.asarray(n), jnp.asarray(ext), cam,
        (256, 256), allow_pallas=False,
    )
    corners = jnp.asarray(np.stack([v[t[:, 0]].T, v[t[:, 1]].T, v[t[:, 2]].T]))
    corner_normals = jnp.asarray(np.stack([n[t[:, 0]].T, n[t[:, 1]].T, n[t[:, 2]].T]))
    img_c, bg_c = rz.render_normal_sketch_corners(
        corners, corner_normals, jnp.asarray(ext), cam, (256, 256),
        allow_pallas=False,
    )
    assert np.array_equal(np.asarray(bg_i), np.asarray(bg_c))
    assert np.abs(np.asarray(img_i) - np.asarray(img_c)).max() < 1e-5
