"""Variational U-Net for vehicle novel-view synthesis (Flax, NHWC).

Parity target: vunet/models.py:17-485 + vunet/layers.py:21-221 with the deployment
config up_mode='subpixel', w_norm=True, drop_prob=0.2, vunet_256=True (run_test.py:82).

The four sub-networks are exposed separately, exactly like the reference uses them in
the pipeline (trajectory_inference.py:230-233): the appearance is encoded ONCE per
vehicle (`encode_appearance` = forward_enc_up + forward_enc_down) and the shape
decoder (`decode_shape` = forward_dec_up + forward_dec_down) runs per future step —
which is why the rollout vmaps over steps with a broadcast appearance code.

Sampling: the reference's Sampler adds N(0,1) noise to every mu even at inference
(vunet/layers.py:158-170), and the decoder consumes the SAMPLED z of each
autoregressive quadrant (vunet/models.py:422,433), so decoding is stochastic — an
explicit 'sample' PRNG stream reproduces that; pass deterministic noise=0 via
``sample_cov=0.0`` for reproducible tests.

Submodule names mirror the torch tree (app_encoder_1.nin.layers_1.conv, ...) for
mechanical checkpoint conversion of vunet/256/vunet.pth.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import linen as nn

from future_urban_scene_generation_tpu.models import layers as L
from future_urban_scene_generation_tpu.models.layers import (
    TorchConv,
    WNConv,
    activation,
    depth_to_space,
    dropout2d,
    space_to_depth,
    upsample2x_nearest_nhwc,
)

_elu = activation("elu")


class MyConv(nn.Module):
    """MyConv2d (vunet/layers.py:21-39): conv with optional weight norm, named 'conv'."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    w_norm: bool = True

    @nn.compact
    def __call__(self, x, skip_in=None):
        if skip_in is not None:
            x = jnp.concatenate([x, skip_in], axis=-1)
        cls = WNConv if self.w_norm else TorchConv
        return cls(self.features, self.kernel_size, self.stride, self.padding, name="conv")(x)


class NiN(nn.Module):
    """elu -> 1x1 conv (vunet/layers.py:42-58). The conv is Sequential index 1."""

    features: int
    w_norm: bool = True

    @nn.compact
    def __call__(self, x):
        return MyConv(self.features, 1, w_norm=self.w_norm, name="layers_1")(_elu(x))


class Residual(nn.Module):
    """concat-skip -> elu -> dropout2d -> 3x3 conv, + residual (vunet/layers.py:83-105).
    The conv is Sequential index 2."""

    features: int
    drop_prob: float = 0.2
    w_norm: bool = True

    @nn.compact
    def __call__(self, x, skip_in=None, deterministic: bool = True):
        residual = x
        groups = None
        if skip_in is not None:
            if L.width_fold_active():
                # Folded tensors concat PLAINLY (free) and the conv kernel is
                # built per group instead — the per-phase data interleave
                # measured ~1.2 ms/concat in the scene trace.
                groups = (residual.shape[-1] // 4, skip_in.shape[-1] // 4)
            x = jnp.concatenate([residual, skip_in], axis=-1)
        x = _elu(x)
        if not deterministic and self.drop_prob > 0.0:
            x = dropout2d(x, self.drop_prob, self.make_rng("dropout"), False)
        conv = MyConv(self.features, 3, padding=1, w_norm=self.w_norm, name="layers_2")
        if groups is not None:
            with L.fold_groups(groups):
                x = conv(x)
        else:
            x = conv(x)
        return x + residual


class DownSample(nn.Module):
    """3x3 stride-2 conv (vunet/layers.py:108-118)."""

    features: int
    w_norm: bool = True

    @nn.compact
    def __call__(self, x):
        return MyConv(self.features, 3, 2, 1, w_norm=self.w_norm, name="down")(x)


class UpSample(nn.Module):
    """subpixel (conv -> depth_to_space) / nearest / conv2d_t (vunet/layers.py:121-155)."""

    features: int
    mode: str = "subpixel"
    w_norm: bool = True

    @nn.compact
    def __call__(self, x, skip_in=None, folded_out: bool = False):
        if skip_in is not None:
            x = jnp.concatenate([x, skip_in], axis=-1)
        if self.mode == "subpixel":
            x = MyConv(4 * self.features, 3, padding=1, w_norm=self.w_norm, name="depth4x")(x)
            if folded_out:
                # Emit the upsample directly in width-folded form: writes the
                # compact (n, 2h, w/2, 4C) layout instead of a 4x lane-padded
                # NHWC tensor (layers.depth_to_space_folded, value-equal).
                return L.depth_to_space_folded(x)
            return depth_to_space(x, 2)
        assert not folded_out, "folded_out only supported for subpixel mode"
        if self.mode == "nearest":
            x = upsample2x_nearest_nhwc(x)
            return MyConv(self.features, 3, padding=1, w_norm=self.w_norm, name="conv")(x)
        raise ValueError(f"unsupported up mode {self.mode}")


class Sampler(nn.Module):
    """mu = conv(x); sample = mu + N(0,1) * cov (vunet/layers.py:158-170)."""

    features: int
    w_norm: bool = True

    @nn.compact
    def __call__(self, x, cov: float = 1.0):
        mu = MyConv(self.features, 3, padding=1, w_norm=self.w_norm, name="conv")(x)
        if cov == 0.0:
            return mu, mu
        noise = jax.random.normal(self.make_rng("sample"), mu.shape, mu.dtype)
        return mu, mu + noise * cov


class InitBlock(nn.Module):
    """NiN + 2 residuals, collecting both as skips (vunet/models.py:142-165)."""

    features: int
    drop_prob: float
    w_norm: bool

    @nn.compact
    def __call__(self, x, deterministic=True, folded: bool = False):
        if folded:
            # Width-folded 256² stage (TPU lane-fill optimization, value-equal
            # — see layers.width_fold_region): x and the returned skips are
            # folded; the caller unfolds at the stage boundary.
            x = L.fold_width4(x)
            with L.width_fold_region():
                return self._body(x, deterministic)
        return self._body(x, deterministic)

    def _body(self, x, deterministic):
        x = NiN(self.features, self.w_norm, name="nin")(x)
        x = Residual(self.features, self.drop_prob, self.w_norm, name="residual_0")(
            x, deterministic=deterministic
        )
        s0 = x
        x = Residual(self.features, self.drop_prob, self.w_norm, name="residual_1")(
            x, deterministic=deterministic
        )
        return x, [s0, x]


class DownBlock(nn.Module):
    """DownSample + 2 residuals with skips (vunet/models.py:92-115)."""

    features: int
    drop_prob: float
    w_norm: bool

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = DownSample(self.features, self.w_norm, name="down")(x)
        x = Residual(self.features, self.drop_prob, self.w_norm, name="residual_0")(
            x, deterministic=deterministic
        )
        s0 = x
        x = Residual(self.features, self.drop_prob, self.w_norm, name="residual_1")(
            x, deterministic=deterministic
        )
        return x, [s0, x]


class UpBlock(nn.Module):
    """2 skip-residuals + upsample (vunet/models.py:118-139)."""

    c_middle: int
    c_out: int
    up_mode: str
    drop_prob: float
    w_norm: bool

    @nn.compact
    def __call__(self, x, skip_a, skip_b, deterministic=True, folded_out: bool = False):
        x = Residual(self.c_middle, self.drop_prob, self.w_norm, name="residual_0")(
            x, skip_a, deterministic
        )
        x = Residual(self.c_middle, self.drop_prob, self.w_norm, name="residual_1")(
            x, skip_b, deterministic
        )
        return UpSample(self.c_out, self.up_mode, self.w_norm, name="up")(
            x, folded_out=folded_out
        )


class EndBlock(nn.Module):
    """2 skip-residuals + 3x3 conv head (vunet/models.py:168-188)."""

    c_middle: int
    c_out: int
    drop_prob: float
    w_norm: bool

    @nn.compact
    def __call__(self, x, skip_a, skip_b, deterministic=True, folded: bool = False):
        res0 = Residual(self.c_middle, self.drop_prob, self.w_norm, name="residual_0")
        res1 = Residual(self.c_middle, self.drop_prob, self.w_norm, name="residual_1")
        head = MyConv(self.c_out, 3, padding=1, w_norm=self.w_norm, name="conv")
        if folded:
            # x, skip_a, skip_b arrive width-folded (the dec_up 256² skips and
            # the folded_out upsample). The head conv ALSO runs folded: its
            # 4*c_out output lanes are few, but unfolding its (c_out=3)-channel
            # output copies 4 MB where unfolding the 32-channel input would
            # copy 100 -> 400 MB (padded layout).
            with L.width_fold_region():
                x = res0(x, skip_a, deterministic)
                x = res1(x, skip_b, deterministic)
                x = head(x)
            return L.unfold_width4(x)
        x = res0(x, skip_a, deterministic)
        x = res1(x, skip_b, deterministic)
        return head(x)


class AutoRegressiveBlock(nn.Module):
    """4-quadrant autoregressive latent block (vunet/models.py:17-89).

    space_to_depth splits the map into 4 channel groups; each quadrant's latent is
    sampled and chained through residuals. With enc_down_mu given (appearance
    transfer), the chained input is the NiN'd appearance quadrant instead of the
    sampled latent.
    """

    drop_prob: float
    w_norm: bool

    @nn.compact
    def __call__(self, x, skip_a, enc_down_mu=None, deterministic=True, cov: float = 1.0):
        dp, wn = self.drop_prob, self.w_norm
        x = Residual(128, dp, wn, name="residual_init")(x, skip_a, deterministic)
        x_ = space_to_depth(
            Residual(128, dp, wn, name="residual_s2d")(x, None, deterministic), 2
        )

        nins = [NiN(512, wn, name=f"nin_{i}") for i in range(3)]
        if enc_down_mu is not None:
            gs = jnp.split(space_to_depth(enc_down_mu, 2), 4, axis=-1)
            g = [nins[i](gs[i]) for i in range(3)]

        mus, zs = [], []
        for i in range(4):
            mu_i, z_i = Sampler(128, wn, name=f"sampler_{i}")(x_, cov)
            mus.append(mu_i)
            zs.append(z_i)
            if i < 3:
                skip = g[i] if enc_down_mu is not None else nins[i](z_i)
                x_ = Residual(512, dp, wn, name=f"residual_{i}")(x_, skip, deterministic)

        mu = depth_to_space(jnp.concatenate(mus, axis=-1), 2)
        z = depth_to_space(jnp.concatenate(zs, axis=-1), 2)
        return x, mu, z


class Vunet(nn.Module):
    """Vunet_fix_res (vunet/models.py:191-485)."""

    up_mode: str = "subpixel"
    w_norm: bool = True
    drop_prob: float = 0.2
    vunet_256: bool = True

    def setup(self):
        dp, wn, um = self.drop_prob, self.w_norm, self.up_mode
        # Appearance encoder (6ch input).
        self.app_encoder_1 = InitBlock(128, dp, wn)
        self.app_encoder_1_a = DownBlock(128, dp, wn)
        self.app_encoder_1_b = DownBlock(128, dp, wn)
        if self.vunet_256:
            self.app_encoder_1_c = DownBlock(128, dp, wn)
        self.app_encoder_2 = DownBlock(128, dp, wn)
        self.app_encoder_3 = DownBlock(128, dp, wn)
        self.app_encoder_4 = DownBlock(128, dp, wn)
        self.app_skip_3_c = NiN(128, wn)
        self.app_skip_4_c = NiN(128, wn)
        # Appearance decoder.
        self.app_bottleneck = MyConv(128, 1, w_norm=wn)
        self.app_decoder_1_a = Residual(128, dp, wn)
        self.app_decoder_1_b = Sampler(128, wn)
        self.app_decoder_1_c = MyConv(128, 1, w_norm=wn)
        self.app_decoder_1_d = Residual(128, dp, wn)
        self.app_decoder_1_e = UpSample(128, um, wn)
        self.app_decoder_2_a = Residual(128, dp, wn)
        self.app_decoder_2_b = Sampler(128, wn)
        # Shape encoder (3ch input).
        self.shape_encoder_1 = InitBlock(32, dp, wn)
        if self.vunet_256:
            self.shape_encoder_1_a = DownBlock(32, dp, wn)
            self.shape_skip_1_a_b = NiN(32, wn)
            self.shape_skip_1_a_c = NiN(32, wn)
        self.shape_encoder_2 = DownBlock(64, dp, wn)
        self.shape_encoder_3 = DownBlock(128, dp, wn)
        self.shape_encoder_4 = DownBlock(128, dp, wn)
        self.shape_encoder_5 = DownBlock(128, dp, wn)
        self.shape_encoder_6 = DownBlock(128, dp, wn)
        self.shape_skip_1_b = NiN(32, wn)
        self.shape_skip_1_c = NiN(32, wn)
        self.shape_skip_2_b = NiN(64, wn)
        self.shape_skip_2_c = NiN(64, wn)
        self.shape_skip_3_b = NiN(128, wn)
        self.shape_skip_3_c = NiN(128, wn)
        self.shape_skip_4_b = NiN(128, wn)
        self.shape_skip_4_c = NiN(128, wn)
        self.shape_skip_5_b = NiN(128, wn)
        self.shape_skip_5_c = NiN(128, wn)
        self.shape_skip_6_b = NiN(128, wn)
        self.shape_skip_6_c = NiN(128, wn)
        # Shape decoder.
        self.shape_bottleneck = MyConv(128, 1, w_norm=wn)
        self.shape_decoder_1 = AutoRegressiveBlock(dp, wn)
        self.shape_decoder_1_n = NiN(128, wn)
        self.shape_decoder_1_o = Residual(128, dp, wn)
        self.shape_decoder_1_p = UpSample(128, um, wn)
        self.shape_decoder_2 = AutoRegressiveBlock(dp, wn)
        self.shape_decoder_2_n = NiN(128, wn)
        self.shape_decoder_2_o = Residual(128, dp, wn)
        self.shape_decoder_2_p = UpSample(128, um, wn)
        self.shape_decoder_3 = UpBlock(128, 128, um, dp, wn)
        self.shape_decoder_4 = UpBlock(128, 64, um, dp, wn)
        self.shape_decoder_5 = UpBlock(64, 32, um, dp, wn)
        if self.vunet_256:
            self.shape_decoder_5_a = UpBlock(32, 32, um, dp, wn)
        self.shape_decoder_6 = EndBlock(32, 3, dp, wn)

    # -- appearance branch (vunet/models.py:333-353, 390-408) -----------------------

    def forward_enc_up(self, x, deterministic=True):
        skips = []
        x, _ = self.app_encoder_1(x, deterministic)
        x, _ = self.app_encoder_1_a(x, deterministic)
        x, _ = self.app_encoder_1_b(x, deterministic)
        if self.vunet_256:
            x, _ = self.app_encoder_1_c(x, deterministic)
        x, _ = self.app_encoder_2(x, deterministic)
        x, _ = self.app_encoder_3(x, deterministic)
        skips.append(self.app_skip_3_c(x))
        x, skips_layer = self.app_encoder_4(x, deterministic)
        outputs = [skips_layer[-2], x]
        skips.append(self.app_skip_4_c(x))
        return outputs, skips

    def forward_enc_down(self, enc_up_outputs, skips, deterministic=True, cov: float = 1.0):
        x = self.app_bottleneck(enc_up_outputs[-1])
        x = self.app_decoder_1_a(x, skips[-1], deterministic)
        mu_0, z_0 = self.app_decoder_1_b(x, cov)
        x_ = self.app_decoder_1_c(jnp.concatenate([enc_up_outputs[-2], z_0], axis=-1))
        x = self.app_decoder_1_d(x, x_, deterministic)
        x = self.app_decoder_1_e(x)
        x = self.app_decoder_2_a(x, None, deterministic)  # no more 8x8 skip
        mu_1, z_1 = self.app_decoder_2_b(x, cov)
        return [mu_0, mu_1], [z_0, z_1]

    # -- shape branch (vunet/models.py:355-388, 410-459) ----------------------------

    def _fold256(self, y_tilde, deterministic) -> bool:
        """Run the 32-channel full-resolution stage width-folded (TPU lane-fill
        + layout optimization; value-equal, pinned by tests/test_vunet.py)."""
        return (
            deterministic
            and L.width_fold_wanted()
            and y_tilde.shape[2] % 4 == 0
            and y_tilde.shape[1] % 2 == 0
        )

    def forward_dec_up(self, y_tilde, deterministic=True):
        skips = []
        fold = self._fold256(y_tilde, deterministic)
        x, sl = self.shape_encoder_1(y_tilde, deterministic, folded=fold)
        if fold:
            with L.width_fold_region():
                skips += [self.shape_skip_1_b(sl[-2]), self.shape_skip_1_c(sl[-1])]
            x = L.unfold_width4(x)
        else:
            skips += [self.shape_skip_1_b(sl[-2]), self.shape_skip_1_c(sl[-1])]
        if self.vunet_256:
            x, sl = self.shape_encoder_1_a(x, deterministic)
            skips += [self.shape_skip_1_a_b(sl[-2]), self.shape_skip_1_a_c(sl[-1])]
        x, sl = self.shape_encoder_2(x, deterministic)
        skips += [self.shape_skip_2_b(sl[-2]), self.shape_skip_2_c(sl[-1])]
        x, sl = self.shape_encoder_3(x, deterministic)
        skips += [self.shape_skip_3_b(sl[-2]), self.shape_skip_3_c(sl[-1])]
        x, sl = self.shape_encoder_4(x, deterministic)
        skips += [self.shape_skip_4_b(sl[-2]), self.shape_skip_4_c(sl[-1])]
        x, sl = self.shape_encoder_5(x, deterministic)
        skips += [self.shape_skip_5_b(sl[-2]), self.shape_skip_5_c(sl[-1])]
        x, sl = self.shape_encoder_6(x, deterministic)
        skips += [self.shape_skip_6_b(sl[-2]), self.shape_skip_6_c(sl[-1])]
        return [x], skips

    def forward_dec_down(
        self, dec_up_outputs, skips, enc_down_mu=(), deterministic=True, cov: float = 1.0
    ):
        skips = list(skips)
        x = self.shape_bottleneck(dec_up_outputs[-1])

        skip_a = skips.pop()
        skip_b = skips.pop()
        mu_a = None if len(enc_down_mu) == 0 else enc_down_mu[0]
        x, mu_0, z_0 = self.shape_decoder_1(x, skip_a, mu_a, deterministic, cov)
        x = self.shape_decoder_1_n(jnp.concatenate([x, z_0], axis=-1))
        x = self.shape_decoder_1_o(x, skip_b, deterministic)
        x = self.shape_decoder_1_p(x)

        skip_a = skips.pop()
        skip_b = skips.pop()
        mu_a = None if len(enc_down_mu) == 0 else enc_down_mu[1]
        x, mu_1, z_1 = self.shape_decoder_2(x, skip_a, mu_a, deterministic, cov)
        x = self.shape_decoder_2_n(jnp.concatenate([x, z_1], axis=-1))
        x = self.shape_decoder_2_o(x, skip_b, deterministic)
        x = self.shape_decoder_2_p(x)

        x = self.shape_decoder_3(x, skips.pop(), skips.pop(), deterministic)
        x = self.shape_decoder_4(x, skips.pop(), skips.pop(), deterministic)
        # Fold state derived from the DATA, not re-derived from gates (ADVICE
        # r3): the remaining skips end with the full-resolution pair
        # (skips[0:2], consumed last by shape_decoder_6), which forward_dec_up
        # stored width-folded iff its _fold256 gate fired. Their width against
        # the never-folded half-resolution skip (skips[2]) identifies the
        # state — unfolded: W == 2 * W_half; folded: W/4 — so this decoder can
        # never consume unfolded skips as folded tensors even if the two
        # gates' shape arithmetic ever diverged.
        fold = skips[0].shape[2] != skips[2].shape[2] * 2
        x = self.shape_decoder_5(
            x, skips.pop(), skips.pop(), deterministic,
            folded_out=fold and not self.vunet_256,
        )
        if self.vunet_256:
            x = self.shape_decoder_5_a(
                x, skips.pop(), skips.pop(), deterministic, folded_out=fold
            )
        x = self.shape_decoder_6(x, skips.pop(), skips.pop(), deterministic, folded=fold)
        assert not skips
        return x, [mu_0, mu_1], [z_0, z_1]

    def __call__(self, y_tilde, x=None, mean_mode="mean_appearance", deterministic=True, cov=1.0):
        """Combined forward (vunet/models.py:461-481)."""
        if mean_mode == "mean_appearance":
            out_up, skips_up = self.forward_enc_up(x, deterministic)
            mu_app, z_app = self.forward_enc_down(out_up, skips_up, deterministic, cov)
            out_dec, skips_dec = self.forward_dec_up(y_tilde, deterministic)
            x_tilde, mu_shape, _ = self.forward_dec_down(
                out_dec, skips_dec, z_app, deterministic, cov
            )
            return x_tilde, mu_app, mu_shape
        out_dec, skips_dec = self.forward_dec_up(y_tilde, deterministic)
        x_tilde, _, _ = self.forward_dec_down(out_dec, skips_dec, (), deterministic, cov)
        return x_tilde

    def encode_appearance(self, x, deterministic=True, cov: float = 1.0):
        """Appearance code mu_app — computed once per vehicle
        (trajectory_inference.py:230-231)."""
        out_up, skips_up = self.forward_enc_up(x, deterministic)
        mu_app, _ = self.forward_enc_down(out_up, skips_up, deterministic, cov)
        return mu_app

    def decode_shape(self, y_tilde, mu_app, deterministic=True, cov: float = 1.0):
        """Novel view from a dst sketch + appearance code
        (trajectory_inference.py:232-233, 424-425)."""
        out_dec, skips_dec = self.forward_dec_up(y_tilde, deterministic)
        x_tilde, _, _ = self.forward_dec_down(out_dec, skips_dec, mu_app, deterministic, cov)
        return x_tilde
