"""Loss parity vs torch (the reference's loss_utils math)."""
import numpy as np
import jax.numpy as jnp

from feature3dgs_tpu.train import losses as L


def test_ssim_matches_torch_reference():
    import torch
    import torch.nn.functional as F
    from math import exp

    def t_gauss(ws, sigma):
        g = torch.Tensor([exp(-(x - ws // 2) ** 2 / (2 * sigma ** 2))
                          for x in range(ws)])
        return g / g.sum()

    def t_ssim(img1, img2, ws=11):
        ch = img1.size(0)
        _1d = t_gauss(ws, 1.5).unsqueeze(1)
        win = _1d.mm(_1d.t()).unsqueeze(0).unsqueeze(0).expand(ch, 1, ws, ws)
        i1, i2 = img1.unsqueeze(0), img2.unsqueeze(0)
        mu1 = F.conv2d(i1, win, padding=ws // 2, groups=ch)
        mu2 = F.conv2d(i2, win, padding=ws // 2, groups=ch)
        mu1s, mu2s, mu12 = mu1 ** 2, mu2 ** 2, mu1 * mu2
        s1 = F.conv2d(i1 * i1, win, padding=ws // 2, groups=ch) - mu1s
        s2 = F.conv2d(i2 * i2, win, padding=ws // 2, groups=ch) - mu2s
        s12 = F.conv2d(i1 * i2, win, padding=ws // 2, groups=ch) - mu12
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        m = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1s + mu2s + c1) * (s1 + s2 + c2))
        return m.mean().item()

    rng = np.random.RandomState(0)
    a = rng.rand(3, 24, 32).astype(np.float32)
    b = np.clip(a + rng.randn(3, 24, 32).astype(np.float32) * 0.1, 0, 1)
    want = t_ssim(torch.tensor(a), torch.tensor(b))
    got = float(L.ssim(jnp.asarray(a.transpose(1, 2, 0)),
                       jnp.asarray(b.transpose(1, 2, 0))))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_resize_bilinear_matches_torch_align_corners():
    import torch
    import torch.nn.functional as F
    rng = np.random.RandomState(1)
    x = rng.randn(9, 13, 5).astype(np.float32)
    want = F.interpolate(torch.tensor(x.transpose(2, 0, 1)).unsqueeze(0),
                         size=(17, 23), mode="bilinear", align_corners=True)
    want = want[0].numpy().transpose(1, 2, 0)
    got = np.asarray(L.resize_bilinear_align_corners(jnp.asarray(x), 17, 23))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_psnr():
    a = jnp.zeros((4, 4, 3))
    b = jnp.full((4, 4, 3), 0.1)
    np.testing.assert_allclose(float(L.psnr(a, b)), 20.0, atol=1e-4)


def test_tv_loss():
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4, 1))
    # dx steps of 1 (3 rows x 3 diffs), dy steps of 4 (2x4 diffs)
    assert float(L.tv_loss(x)) == 3 * 3 * 1 + 2 * 4 * 16


def test_lpips_jax_matches_torch_reference(tmp_path):
    """Native JAX LPIPS math vs an independent torch implementation of the
    same VGG16 trunk + linear heads, sharing one set of random weights
    (pretrained weights are unavailable offline; this validates the MATH of
    feature3dgs_tpu/metrics/lpips_jax.py against lpipsPyTorch's definition:
    unit-normalized tap activations, squared diff, linear head, spatial
    mean, layer sum)."""
    import math
    import torch
    import torch.nn.functional as F
    from feature3dgs_tpu.metrics import lpips_jax as LJ

    rng = np.random.RandomState(0)
    cfg = LJ._VGG16
    weights = {}
    prev = 3
    ci = 0
    for spec in cfg:
        if spec == "M":
            continue
        weights[f"conv{ci}_w"] = (rng.randn(3, 3, prev, spec)
                                  .astype(np.float32) / math.sqrt(9 * prev))
        weights[f"conv{ci}_b"] = rng.randn(spec).astype(np.float32) * 0.1
        prev = spec
        ci += 1
    for j, c in enumerate([64, 128, 256, 512, 512]):
        weights[f"lin{j}_w"] = np.abs(rng.randn(c).astype(np.float32)) * 0.05
    path = str(tmp_path / "lpips_test.npz")
    np.savez(path, **weights)

    a = rng.rand(64, 64, 3).astype(np.float32)
    b = np.clip(a + rng.randn(64, 64, 3).astype(np.float32) * 0.1, 0, 1)

    w = LJ.load_lpips_weights(path)
    got = LJ.lpips_distance(a, b, weights=w)

    def torch_taps(img):
        x = torch.tensor(img.transpose(2, 0, 1))[None] * 2 - 1
        x = (x - torch.tensor(LJ._SHIFT)[None, :, None, None]) \
            / torch.tensor(LJ._SCALE)[None, :, None, None]
        taps = []
        ci = 0
        for spec in cfg:
            if spec == "M":
                x = F.max_pool2d(x, 2, 2)
                continue
            wt = torch.tensor(
                weights[f"conv{ci}_w"].transpose(3, 2, 0, 1))  # HWIO->OIHW
            bt = torch.tensor(weights[f"conv{ci}_b"])
            x = F.relu(F.conv2d(x, wt, bt, padding=1))
            if ci in LJ._TAP_AFTER_CONV:
                taps.append(x)
            ci += 1
        return taps

    ta, tb = torch_taps(a), torch_taps(b)
    want = 0.0
    for j, (fa, fb) in enumerate(zip(ta, tb)):
        na = fa / torch.sqrt((fa * fa).sum(1, keepdim=True) + 1e-10)
        nb = fb / torch.sqrt((fb * fb).sum(1, keepdim=True) + 1e-10)
        d2 = (na - nb) ** 2
        lin = torch.tensor(weights[f"lin{j}_w"])[None, :, None, None]
        want += float((d2 * lin).sum(1).mean())
    assert abs(got - want) <= 1e-4 * max(abs(want), 1e-3), (got, want)


def test_resize_from_tiles_matches_image_path():
    """resize_bilinear_from_tiles folds the tile->image permutation into the
    interpolation contraction; must equal tiles_to_image + image resize."""
    import jax
    from feature3dgs_tpu.ops.binning import TileGrid
    from feature3dgs_tpu.ops.rasterize import tiles_to_image
    grid = TileGrid(width=50, height=35, tile_w=16, tile_h=16)
    rng = np.random.RandomState(0)
    tiles = jnp.asarray(rng.randn(grid.num_tiles, grid.pixels_per_tile, 7)
                        .astype(np.float32))
    want = L.resize_bilinear_align_corners(tiles_to_image(tiles, grid), 19, 23)
    got = L.resize_bilinear_from_tiles(tiles, grid, 19, 23)
    np.testing.assert_allclose(got, want, atol=1e-5)
    # identity-size short-circuit
    np.testing.assert_allclose(
        L.resize_bilinear_from_tiles(tiles, grid, 35, 50),
        tiles_to_image(tiles, grid), atol=0)
    # gradients agree (the transposed contraction vs transpose+resize^T)
    t = jnp.asarray(rng.randn(19, 23, 7).astype(np.float32))
    g1 = jax.grad(lambda x: jnp.sum(
        jnp.abs(L.resize_bilinear_from_tiles(x, grid, 19, 23) - t)))(tiles)
    g2 = jax.grad(lambda x: jnp.sum(jnp.abs(
        L.resize_bilinear_align_corners(tiles_to_image(x, grid), 19, 23)
        - t)))(tiles)
    np.testing.assert_allclose(g1, g2, atol=1e-5)


def test_resize_from_tile_rows_partials_sum_to_full():
    """The tile-sharded resize: per-row-block partial contractions must sum
    exactly to the full from-tiles resize (psum semantics on the mesh)."""
    from feature3dgs_tpu.ops.binning import TileGrid
    grid = TileGrid(width=50, height=35, tile_w=16, tile_h=16)  # 3x4 rows
    rng = np.random.RandomState(1)
    tiles = jnp.asarray(rng.randn(grid.num_tiles, grid.pixels_per_tile, 5)
                        .astype(np.float32))
    want = L.resize_bilinear_from_tiles(tiles, grid, 18, 25)
    # shard into 4 row-blocks of 1 padded row each (gy=3 padded to 4)
    n_shards, gy_pad = 4, 4
    padded = jnp.concatenate(
        [tiles, jnp.zeros(((gy_pad * grid.grid_x) - grid.num_tiles,)
                          + tiles.shape[1:], tiles.dtype)])
    rows_loc = gy_pad // n_shards
    parts = []
    for s in range(n_shards):
        loc = padded[s * rows_loc * grid.grid_x:
                     (s + 1) * rows_loc * grid.grid_x]
        parts.append(L.resize_bilinear_from_tile_rows(
            loc, grid, 18, 25, s * rows_loc, rows_loc, gy_pad))
    got = sum(parts)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_blur_shift_matches_matmul_and_torch():
    """The shift-add SSIM blur (BLUR_IMPL='shift') must match both the
    banded-matmul blur and the torch conv2d reference: it is the same
    zero-padded gaussian, computed in pure f32 instead of MXU passes."""
    import torch
    import torch.nn.functional as F
    rng = np.random.RandomState(3)
    x = rng.rand(24, 32, 3).astype(np.float32)
    by = jnp.asarray(L._conv1d_matrix(24, 11, 1.5))
    bx = jnp.asarray(L._conv1d_matrix(32, 11, 1.5))
    want = np.asarray(L._apply_separable(jnp.asarray(x), by, bx))
    got = np.asarray(L._blur_shift(jnp.asarray(x), 11, 1.5))
    np.testing.assert_allclose(got, want, atol=1e-6)
    g = torch.Tensor([np.exp(-(i - 5) ** 2 / (2 * 1.5 ** 2))
                      for i in range(11)])
    g = (g / g.sum()).unsqueeze(1)
    win = g.mm(g.t()).unsqueeze(0).unsqueeze(0).expand(3, 1, 11, 11)
    t = torch.tensor(x.transpose(2, 0, 1)).unsqueeze(0)
    ref = F.conv2d(t, win, padding=5, groups=3)[0].numpy().transpose(1, 2, 0)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_ssim_shift_impl_matches_matmul(monkeypatch):
    rng = np.random.RandomState(4)
    a = jnp.asarray(rng.rand(24, 32, 3).astype(np.float32))
    b = jnp.asarray(np.clip(np.asarray(a)
                            + rng.randn(24, 32, 3).astype(np.float32) * 0.1,
                            0, 1))
    want = float(L.ssim(a, b))
    monkeypatch.setattr(L, "BLUR_IMPL", "shift")
    got = float(L.ssim(a, b))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_resize_blocked_matches_dense():
    """Block-banded resize factorization is exact vs the dense contraction
    (the dropped terms are structural zeros; every nonzero stays inside its
    block window by construction), values AND gradients."""
    import jax
    from feature3dgs_tpu.ops.binning import TileGrid
    grid = TileGrid(width=256, height=192, tile_w=16, tile_h=16)  # 12x16
    rng = np.random.RandomState(5)
    tiles = jnp.asarray(rng.randn(grid.num_tiles, grid.pixels_per_tile, 6)
                        .astype(np.float32))
    for out_h, out_w in ((96, 128), (50, 70), (192, 300)):
        want = L.resize_bilinear_from_tiles(tiles, grid, out_h, out_w)
        got = L._resize_from_tiles_blocked(tiles, grid, out_h, out_w,
                                           block=16)
        assert got is not None, (out_h, out_w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, err_msg=f"{out_h}x{out_w}")
    t = jnp.asarray(rng.randn(96, 128, 6).astype(np.float32))
    g1 = jax.grad(lambda x: jnp.sum(jnp.abs(
        L._resize_from_tiles_blocked(x, grid, 96, 128, block=16) - t)))(tiles)
    g2 = jax.grad(lambda x: jnp.sum(jnp.abs(
        L.resize_bilinear_from_tiles(x, grid, 96, 128) - t)))(tiles)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_resize_blocked_dispatch_and_fallback(monkeypatch):
    """RESIZE_IMPL='blocked' routes through the factorized path at scale and
    silently falls back to dense when blocking cannot shrink the window
    (tiny grids)."""
    from feature3dgs_tpu.ops.binning import TileGrid
    monkeypatch.setattr(L, "RESIZE_IMPL", "blocked")
    rng = np.random.RandomState(6)
    small = TileGrid(width=50, height=35, tile_w=16, tile_h=16)
    tiles = jnp.asarray(rng.randn(small.num_tiles, small.pixels_per_tile, 4)
                        .astype(np.float32))
    want = L._resize_from_tiles_blocked(tiles, small, 19, 23)
    assert want is None  # 3x4 tile grid: nothing to block
    out = L.resize_bilinear_from_tiles(tiles, small, 19, 23)  # falls back
    monkeypatch.setattr(L, "RESIZE_IMPL", "matmul")
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(L.resize_bilinear_from_tiles(tiles, small, 19, 23)),
        atol=0)


def test_resize_stride_exact_vs_f64_oracle():
    """The stride impl (per-block tile-axis contractions at HIGHEST) is the
    exact-f32 2-tap resize: ~1e-6 from a float64 dense-operator oracle
    (tighter than the 3-pass bf16 HIGH contraction it replaces)."""
    from feature3dgs_tpu.ops.binning import TileGrid
    rng = np.random.RandomState(7)
    for h, w, oh, ow in [(128, 160, 64, 80), (96, 128, 48, 64),
                         (64, 64, 16, 16), (35, 50, 16, 24)]:
        grid = TileGrid(width=w, height=h, tile_w=16, tile_h=16)
        tiles = rng.randn(grid.num_tiles, grid.pixels_per_tile, 6
                          ).astype(np.float32)
        got = L._stride_resize_from_tiles(jnp.asarray(tiles), grid, oh, ow)
        assert got is not None, (h, w, oh, ow)
        got = np.asarray(got, np.float64)
        gy, gx = grid.grid_y, grid.grid_x
        img = tiles.reshape(gy, gx, 16, 16, 6).transpose(0, 2, 1, 3, 4
            ).reshape(gy * 16, gx * 16, 6)[:h, :w].astype(np.float64)
        ry = L._interp_matrix(h, oh).astype(np.float64)
        rx = L._interp_matrix(w, ow).astype(np.float64)
        want = np.einsum("ph,hwc->pwc", ry, img)
        want = np.einsum("qw,pwc->pqc", rx, want)
        np.testing.assert_allclose(got, want, atol=2e-6)


def test_resize_stride_gradients_match_dense():
    """AD through the per-block dots must match the dense contraction's
    transposed-matmul gradient."""
    import jax
    from feature3dgs_tpu.ops.binning import TileGrid
    grid = TileGrid(width=160, height=128, tile_w=16, tile_h=16)
    rng = np.random.RandomState(9)
    tiles = jnp.asarray(rng.randn(grid.num_tiles, grid.pixels_per_tile, 4)
                        .astype(np.float32))
    t = jnp.asarray(rng.randn(64, 80, 4).astype(np.float32))

    def loss_stride(x):
        return jnp.sum(jnp.abs(
            L._stride_resize_from_tiles(x, grid, 64, 80) - t))

    def loss_dense(x):
        return jnp.sum(jnp.abs(
            L.resize_bilinear_from_tiles(x, grid, 64, 80) - t))

    g1 = np.asarray(jax.grad(loss_stride)(tiles))
    g2 = np.asarray(jax.grad(loss_dense)(tiles))
    np.testing.assert_allclose(g1, g2, atol=2e-4)


def test_resize_stride_dispatch_and_fallback(monkeypatch):
    """RESIZE_IMPL='stride' routes resize_bilinear_from_tiles through the
    block-dot path when a plan exists and falls back to dense otherwise
    (upsample, partial output blocks, wide tap drift)."""
    from feature3dgs_tpu.ops.binning import TileGrid
    grid = TileGrid(width=50, height=35, tile_w=16, tile_h=16)
    rng = np.random.RandomState(6)
    tiles = jnp.asarray(rng.randn(grid.num_tiles, grid.pixels_per_tile, 3)
                        .astype(np.float32))
    assert L._stride_resize_from_tiles(tiles, grid, 70, 100) is None
    assert L._stride_resize_from_tiles(tiles, grid, 19, 23) is None
    monkeypatch.setattr(L, "RESIZE_IMPL", "stride")
    routed = L.resize_bilinear_from_tiles(tiles, grid, 16, 24)   # has plan
    fell_back = L.resize_bilinear_from_tiles(tiles, grid, 19, 23)
    monkeypatch.setattr(L, "RESIZE_IMPL", "matmul")
    np.testing.assert_allclose(
        np.asarray(routed),
        np.asarray(L._stride_resize_from_tiles(tiles, grid, 16, 24)), atol=0)
    np.testing.assert_allclose(
        np.asarray(fell_back),
        np.asarray(L.resize_bilinear_from_tiles(tiles, grid, 19, 23)),
        atol=0)


def test_resize_stride_tile_rows_partials_sum_to_full(monkeypatch):
    """The stride impl's tile-sharded form: per-row-block partials must sum
    to the full stride resize (psum semantics), including the crossing-tap
    term that reads a neighbor shard's first rows."""
    from feature3dgs_tpu.ops.binning import TileGrid
    grid = TileGrid(width=50, height=35, tile_w=16, tile_h=16)  # 3x4 rows
    rng = np.random.RandomState(11)
    tiles = jnp.asarray(rng.randn(grid.num_tiles, grid.pixels_per_tile, 5)
                        .astype(np.float32))
    want = L._stride_resize_from_tiles(tiles, grid, 16, 24)
    assert want is not None
    n_shards, gy_pad = 4, 4
    padded = jnp.concatenate(
        [tiles, jnp.zeros(((gy_pad * grid.grid_x) - grid.num_tiles,)
                          + tiles.shape[1:], tiles.dtype)])
    rows_loc = gy_pad // n_shards
    monkeypatch.setattr(L, "RESIZE_IMPL", "stride")
    parts = []
    for s in range(n_shards):
        loc = padded[s * rows_loc * grid.grid_x:
                     (s + 1) * rows_loc * grid.grid_x]
        parts.append(L.resize_bilinear_from_tile_rows(
            loc, grid, 16, 24, s * rows_loc, rows_loc, gy_pad))
    monkeypatch.setattr(L, "RESIZE_IMPL", "matmul")
    got = np.asarray(sum(parts))
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)
    # and the dense path agrees (cross-impl consistency)
    np.testing.assert_allclose(
        got, np.asarray(L.resize_bilinear_from_tiles(tiles, grid, 16, 24)),
        atol=1e-4)
