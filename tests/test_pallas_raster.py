"""Pallas rasterizer kernel vs the XLA rasterizer (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from future_urban_scene_generation_tpu.ops import pallas_raster as pr
from future_urban_scene_generation_tpu.render import rasterizer as rz

rng = np.random.RandomState(31)


def _random_scene(n_verts=40, n_tris=60):
    verts = jnp.asarray(
        rng.rand(n_verts, 3) * [250, 250, 3] + [0, 0, 4], jnp.float32
    )
    tris = jnp.asarray(rng.randint(0, n_verts, (n_tris, 3)), jnp.int32)
    colors = jnp.asarray(rng.rand(n_verts, 3), jnp.float32)
    return verts, tris, colors


def test_pixel_identical_to_xla():
    verts, tris, colors = _random_scene()
    img_ref, bg_ref = rz.rasterize(verts, tris, colors, (256, 256))
    img_pl, bg_pl = pr.rasterize_pallas(verts, tris, colors, (256, 256), interpret=True)
    assert np.array_equal(np.asarray(bg_ref), np.asarray(bg_pl))
    # The kernel evaluates z as a precomputed affine plane; where two triangles
    # intersect/coincide, float-eps z differences can flip the winner vs the XLA
    # path's barycentric z. Allow a tiny fraction of such pixels.
    d = np.abs(np.asarray(img_ref) - np.asarray(img_pl)).max(-1)
    frac_diff = (d > 1e-4).mean()
    assert frac_diff < 0.005, frac_diff


def test_behind_camera_and_degenerate_dropped():
    verts = jnp.asarray(
        [[10.0, 10.0, -5.0], [200.0, 10.0, -5.0], [10.0, 200.0, -5.0],  # behind
         [50.0, 50.0, 5.0], [50.0, 50.0, 5.0], [50.0, 50.0, 5.0]],  # degenerate
        jnp.float32,
    )
    tris = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    colors = jnp.ones((6, 3))
    _, bg = pr.rasterize_pallas(verts, tris, colors, (256, 128), interpret=True)
    assert np.asarray(bg).all()


def test_depth_tie_first_wins():
    # Two coincident quads, different colors: the first triangle in buffer order wins
    # (strict < depth test), matching the XLA path's argmin-first semantics.
    verts = jnp.asarray(
        [[10.0, 10.0, 5.0], [100.0, 10.0, 5.0], [10.0, 100.0, 5.0]], jnp.float32
    )
    tris = jnp.asarray([[0, 1, 2], [0, 1, 2]], jnp.int32)
    colors_a = jnp.asarray([[1.0, 0, 0]] * 3)
    img, _ = pr.rasterize_pallas(
        verts, tris, jnp.asarray([[1.0, 0, 0]] * 3), (64, 128), interpret=True
    )
    assert np.asarray(img)[30, 30, 0] > 0.9


def test_triangle_planes_bbox():
    verts, tris, colors = _random_scene(10, 8)
    table, chunk_bbox = pr.triangle_planes(verts, tris, colors)
    n_groups = pr.CHUNK // pr.GROUP  # 8 triangles pad to one chunk
    assert table.shape == (n_groups * pr.GROUP, pr.TABLE_COLS)
    assert chunk_bbox.shape == (1, 4)
    c = np.asarray(table).reshape(n_groups, pr.GROUP, pr.TABLE_COLS)
    # Group 0 holds the 8 real triangles; its bbox cols must be ordered (and
    # replicated across the group's rows); the chunk bbox is the union over
    # groups (padding groups have empty bboxes).
    b0 = c[0, 0, pr._BBOX_COL:pr._BBOX_COL + 4]
    assert b0[0] <= b0[1] and b0[2] <= b0[3]
    assert np.all(c[0, :, pr._BBOX_COL:pr._BBOX_COL + 4] == b0[None])
    for g in range(1, n_groups):
        bg = c[g, 0, pr._BBOX_COL:pr._BBOX_COL + 4]
        assert bg[0] > bg[1]  # empty: padding-only group
        # padding triangles carry the -1 coverage plane (never covered)
        assert np.all(c[g, :, 2] == -1.0)
    cb = np.asarray(chunk_bbox)[0]
    assert cb[0] == b0[0] and cb[1] == b0[1]


def test_multi_chunk_equivalence():
    # More triangles than one CHUNK: the streamed grid accumulates the z/color
    # tile across chunk steps; the result must still match the XLA path.
    verts, tris, colors = _random_scene(n_verts=80, n_tris=pr.CHUNK + 97)
    img_ref, bg_ref = rz.rasterize(verts, tris, colors, (64, 128))
    img_pl, bg_pl = pr.rasterize_pallas(verts, tris, colors, (64, 128), interpret=True)
    assert np.array_equal(np.asarray(bg_ref), np.asarray(bg_pl))
    d = np.abs(np.asarray(img_ref) - np.asarray(img_pl)).max(-1)
    assert (d > 1e-4).mean() < 0.005


def test_vmap_batched_matches_single():
    # The pipeline calls the kernel under nested vmaps (vehicles × steps); the
    # batching rule must keep the per-batch chunk accumulation intact.
    import jax

    scenes = [_random_scene(20, 12) for _ in range(3)]
    verts = jnp.stack([s[0] for s in scenes])
    tris = jnp.stack([s[1] for s in scenes])
    colors = jnp.stack([s[2] for s in scenes])
    f = lambda v, t, c: pr.rasterize_pallas(v, t, c, (64, 128), interpret=True)
    imgs_b, bgs_b = jax.vmap(f)(verts, tris, colors)
    for k in range(3):
        img_s, bg_s = f(verts[k], tris[k], colors[k])
        assert np.array_equal(np.asarray(bgs_b[k]), np.asarray(bg_s))
        assert np.allclose(np.asarray(imgs_b[k]), np.asarray(img_s))


def _corners_from_indexed(verts, tris, colors):
    v = np.asarray(verts)
    t = np.asarray(tris)
    c = np.asarray(colors)
    screen = np.stack([v[t[:, 0]].T, v[t[:, 1]].T, v[t[:, 2]].T])
    rgb = np.stack([c[t[:, 0]].T, c[t[:, 1]].T, c[t[:, 2]].T])
    return jnp.asarray(screen), jnp.asarray(rgb)


def test_corners_entry_matches_indexed():
    # The serving path's gather-free entry (pre-expanded lane-major corners, as
    # CadBank builds them) must be bit-identical to the indexed entry: it is the
    # same prep on the same values, minus the gathers.
    verts, tris, colors = _random_scene(n_verts=50, n_tris=pr.CHUNK + 33)
    screen, rgb = _corners_from_indexed(verts, tris, colors)
    img_i, bg_i = pr.rasterize_pallas(verts, tris, colors, (64, 128), interpret=True)
    img_c, bg_c = pr.rasterize_pallas_corners(screen, rgb, (64, 128), interpret=True)
    assert np.array_equal(np.asarray(bg_i), np.asarray(bg_c))
    assert np.array_equal(np.asarray(img_i), np.asarray(img_c))


def test_dense_mesh_6144_tris():
    # Round-2 regression: the kernel's previous VMEM-resident table OOM'd the
    # 16 MB scoped-VMEM limit at exactly this density (a subdiv=16 test car =
    # 6,144 triangles; the reference's Pascal3D+ CADs are this order). The
    # (T, 32) table is 128 B/triangle, so this must compile and match the XLA
    # path. Dense meshes put many sliver triangles on the silhouette, where
    # the affine-plane coverage can flip an edge pixel vs the XLA path's
    # direct barycentric signs — allow a small fraction of such pixels.
    from future_urban_scene_generation_tpu.utils import mesh as mu

    mesh, _ = mu.make_test_car(subdiv=16)
    assert mesh.triangles.shape[0] >= 6144
    n = mu.compute_vertex_normals(mesh)
    verts = jnp.asarray(np.float32(mesh.vertices * 40 + [64, 32, 8]))
    colors = jnp.asarray(np.float32((n + 1) / 2))
    tris = jnp.asarray(mesh.triangles)
    img_pl, bg_pl = pr.rasterize_pallas(verts, tris, colors, (64, 128), interpret=True)
    img_x, bg_x = rz.rasterize(verts, tris, colors, (64, 128))
    bg_flip = (np.asarray(bg_x) != np.asarray(bg_pl)).mean()
    assert bg_flip < 0.005, bg_flip
    d = np.abs(np.asarray(img_x) - np.asarray(img_pl)).max(-1)
    assert (d > 1e-3).mean() < 0.01


def test_backface_cull_exact_on_closed_mesh():
    # orient_for_backface_cull establishes outward winding; culling (area >= 0
    # dropped) must then be pixel-exact on a closed mesh, in BOTH rasterizer
    # paths, while keeping ~half the triangles live.
    from future_urban_scene_generation_tpu.utils import mesh as mu

    mesh, _ = mu.make_test_car(subdiv=6)
    oriented, cullable = mu.orient_for_backface_cull(mesh)
    assert cullable
    n = mu.compute_vertex_normals(mesh)
    verts = jnp.asarray(np.float32(oriented.vertices * 40 + [64, 32, 8]))
    colors = jnp.asarray(np.float32((n + 1) / 2))
    tris = jnp.asarray(oriented.triangles)
    screen = jnp.stack([verts[tris[:, 0]].T, verts[tris[:, 1]].T, verts[tris[:, 2]].T])
    rgb = jnp.stack([colors[tris[:, 0]].T, colors[tris[:, 1]].T, colors[tris[:, 2]].T])

    img0, bg0 = pr.rasterize_pallas_corners(screen, rgb, (64, 128), interpret=True)
    img1, bg1 = pr.rasterize_pallas_corners(
        screen, rgb, (64, 128), interpret=True, cull=jnp.asarray(True)
    )
    assert np.array_equal(np.asarray(bg0), np.asarray(bg1))
    assert np.array_equal(np.asarray(img0), np.asarray(img1))

    imgx, bgx = rz.rasterize_corners(screen, rgb, (64, 128), cull=jnp.asarray(True))
    assert np.array_equal(np.asarray(bgx), np.asarray(bg0))
    d = np.abs(np.asarray(imgx) - np.asarray(img1)).max()
    assert d < 1e-5, d

    # The cull actually drops triangles: check via the prep table's bboxes
    # (culled triangles get empty bboxes).
    table_all, _ = pr.triangle_planes_corners(screen, rgb)
    table_cull, _ = pr.triangle_planes_corners(screen, rgb, cull=jnp.asarray(True))
    live = lambda tb: int(np.sum(np.asarray(tb)[:, pr._BBOX_COL] < 1e29))  # noqa: E731
    assert live(table_cull) < live(table_all)


def test_backface_cull_false_flag_is_identity():
    # A traced False flag must not change anything (non-closed random soup).
    verts, tris, colors = _random_scene(n_verts=30, n_tris=40)
    screen, rgb = _corners_from_indexed(verts, tris, colors)
    img0, bg0 = pr.rasterize_pallas_corners(screen, rgb, (64, 128), interpret=True)
    img1, bg1 = pr.rasterize_pallas_corners(
        screen, rgb, (64, 128), interpret=True, cull=jnp.asarray(False)
    )
    assert np.array_equal(np.asarray(img0), np.asarray(img1))
    assert np.array_equal(np.asarray(bg0), np.asarray(bg1))


def test_bin_groups_for_tiles_matches_bruteforce():
    # The binning prepass must list exactly the groups whose bbox intersects
    # each tile (compacted to the row front, bases ascending), with counts.
    verts, tris, colors = _random_scene(n_verts=60, n_tris=2 * pr.CHUNK + 11)
    screen, rgb = _corners_from_indexed(verts, tris, colors)
    table, _ = pr.triangle_planes_corners(screen, rgb)
    n_i, n_j = 2, 2  # 64 x 256 canvas
    bins, counts = pr.bin_groups_for_tiles(table, n_i, n_j)
    tb = np.asarray(table)
    gb = tb[::pr.GROUP, pr._BBOX_COL:pr._BBOX_COL + 4]
    n_groups = gb.shape[0]
    bins = np.asarray(bins).reshape(n_i * n_j, n_groups)
    counts = np.asarray(counts).reshape(-1)
    for t in range(n_i * n_j):
        ti, tj = t // n_j, t % n_j
        x0, y0 = tj * pr.TILE_W, ti * pr.TILE_H
        ov = (
            (gb[:, 1] >= x0) & (gb[:, 0] <= x0 + pr.TILE_W - 1)
            & (gb[:, 3] >= y0) & (gb[:, 2] <= y0 + pr.TILE_H - 1)
        )
        expect = np.nonzero(ov)[0] * pr.GROUP
        assert counts[t] == len(expect)
        assert np.array_equal(bins[t, :len(expect)], expect)
