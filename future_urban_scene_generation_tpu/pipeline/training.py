"""Training machinery: GAN trainers for ICN (Warp&Learn) and EdgeConnect.

The reference ships training heads but no driver (SURVEY §2.1 "vestigial"):
EdgeConnect's process()/backward() steps (edgeconnect/models.py:87-144, 184-247) and
the ICN's multi-scale discriminator + GANLoss (warp_learn/models.py:211-320). This
module provides the actual trainers the TPU framework exposes:

* separate Adam optimizers per generator/discriminator with the reference's
  hyperparameters (LR, D2G_LR=0.1, betas (0.0, 0.9) — edgeconnect/config.py:42-45);
* EdgeModel step: nsgan adversarial + 10x feature matching (models.py:87-128);
* InpaintingModel step: 0.01x adversarial + L1/mean(mask) + perceptual + style
  (models.py:184-234);
* ICN step: LSGAN over the multi-scale PatchGAN + L1 reconstruction;
* all steps are pure (state, batch) -> (state, metrics) functions, jittable and
  shardable over a (data, model) mesh — gradients reduce over 'data' via XLA.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from future_urban_scene_generation_tpu.models import edgeconnect as ec
from future_urban_scene_generation_tpu.models.icn import DNLayersMulti, GResnet, gan_loss
from future_urban_scene_generation_tpu.models.vgg import VGG19Features


class GANTrainState(NamedTuple):
    gen_params: Any
    dis_params: Any
    gen_opt_state: Any
    dis_opt_state: Any
    iteration: jnp.ndarray
    # Power-iteration state for spectral-normalized discriminators ('spectral'
    # collection); None for non-SN trainers.
    dis_state: Any = None
    # Same for SN generators (only the EdgeConnect edge generator — torch
    # spectral_norms its convs too, networks.py:213-217).
    gen_state: Any = None


def make_optimizers(lr: float = 1e-4, d2g_lr: float = 0.1, b1: float = 0.0, b2: float = 0.9):
    gen_tx = optax.adam(lr, b1=b1, b2=b2)
    dis_tx = optax.adam(lr * d2g_lr, b1=b1, b2=b2)
    return gen_tx, dis_tx


# ---------------------------------------------------------------------------
# ICN (Warp&Learn)
# ---------------------------------------------------------------------------

def update_bn_running_stats(params, bn_stats, momentum: float = 0.1):
    """torch BatchNorm running-stat EMA from sown batch statistics.

    ``bn_stats`` is the 'bn_stats' collection from an apply with train=True: each BN
    module holds {'mean': (stat,), 'var': (stat,)} at the same tree path as its
    params. running <- (1 - momentum) * running + momentum * batch (torch converts
    batch var to unbiased for the running update; batch sizes here are large enough
    that we keep the biased value — sub-1e-3 relative difference).
    """

    def walk(p_node, s_node):
        if isinstance(p_node, dict):
            out = {}
            for k, v in p_node.items():
                s_child = s_node.get(k, None) if isinstance(s_node, dict) else None
                if (
                    k == "running_mean"
                    and isinstance(s_node, dict)
                    and "mean" in s_node
                ):
                    out[k] = (1 - momentum) * v + momentum * s_node["mean"][0]
                elif (
                    k == "running_var"
                    and isinstance(s_node, dict)
                    and "var" in s_node
                ):
                    out[k] = (1 - momentum) * v + momentum * s_node["var"][0]
                elif s_child is not None:
                    out[k] = walk(v, s_child)
                else:
                    out[k] = v
            return out
        return p_node

    return walk(params, bn_stats)


class HourglassTrainer:
    """Keypoint-heatmap trainer with intermediate supervision (the reference trained
    its hourglass externally; MSE over every stack's heatmaps is the standard
    objective) and torch-faithful BatchNorm running-stat updates."""

    def __init__(self, num_stacks: int = 2, num_blocks: int = 1, num_classes: int = 12,
                 lr: float = 2.5e-4):
        from future_urban_scene_generation_tpu.models.hourglass import HourglassNet

        self.model = HourglassNet(
            num_stacks=num_stacks, num_blocks=num_blocks, num_classes=num_classes,
            train=True,
        )
        self.eval_model = HourglassNet(
            num_stacks=num_stacks, num_blocks=num_blocks, num_classes=num_classes
        )
        self.tx = optax.adam(lr)

    def init(self, key, hw=(256, 256)):
        variables = self.model.init(key, jnp.zeros((1, hw[0], hw[1], 3)))
        params = variables["params"]
        return params, self.tx.init(params)

    def train_step(self, params, opt_state, images, target_heatmaps):
        """images: (B, H, W, 3) ImageNet-normalized; target_heatmaps: (B, h/4, w/4, K)."""

        def loss_fn(p):
            out, aux = self.model.apply(
                {"params": p}, images, mutable=["bn_stats"]
            )
            loss = sum(
                jnp.mean((hm - target_heatmaps) ** 2) for hm in out["heatmaps"]
            )
            return loss, aux["bn_stats"]

        (loss, bn_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = self.tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        params = update_bn_running_stats(params, bn_stats)
        return params, opt_state, {"loss": loss}


class CadClassifierTrainer:
    """Cross-entropy fine-tuning of the VGG19 CAD head (run_test.py:45-58's model;
    the reference froze it at inference)."""

    def __init__(self, num_classes: int = 10, lr: float = 1e-4):
        from future_urban_scene_generation_tpu.models.vgg import VGG19Classifier

        self.model = VGG19Classifier(num_classes=num_classes)
        self.tx = optax.adam(lr)

    def init(self, key, hw=(256, 256)):
        params = self.model.init(key, jnp.zeros((1, hw[0], hw[1], 3)))
        return params, self.tx.init(params)

    def train_step(self, params, opt_state, images, labels):
        def loss_fn(p):
            logits = self.model.apply(p, images)
            return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self.tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss}


class ICNTrainer:
    """LSGAN + L1 trainer for the 21->3 generator with the multi-scale PatchGAN."""

    def __init__(self, input_nc: int = 21, ndf: int = 64, l1_weight: float = 10.0,
                 lr: float = 1e-4):
        self.gen = GResnet(input_nc=input_nc)
        self.dis = DNLayersMulti(input_nc=3, ndf=ndf)
        self.l1_weight = l1_weight
        self.gen_tx, self.dis_tx = make_optimizers(lr)

    def init(self, key, sample_input, sample_target) -> GANTrainState:
        kg, kd = jax.random.split(key)
        gen_params = self.gen.init(kg, sample_input)
        dis_params = self.dis.init(kd, sample_target)
        return GANTrainState(
            gen_params, dis_params,
            self.gen_tx.init(gen_params), self.dis_tx.init(dis_params),
            jnp.int32(0),
        )

    def train_step(
        self, state: GANTrainState, inputs: jnp.ndarray, targets: jnp.ndarray
    ) -> Tuple[GANTrainState, Dict[str, jnp.ndarray]]:
        """inputs: (B, H, W, 21) LAB [-1,1]; targets: (B, H, W, 3)."""

        fake = self.gen.apply(state.gen_params, inputs)

        def dis_loss_fn(dis_params):
            d_real = self.dis.apply(dis_params, targets)
            d_fake = self.dis.apply(dis_params, jax.lax.stop_gradient(fake))
            return 0.5 * (gan_loss(d_real, True) + gan_loss(d_fake, False))

        dis_loss, dis_grads = jax.value_and_grad(dis_loss_fn)(state.dis_params)
        dis_updates, dis_opt_state = self.dis_tx.update(dis_grads, state.dis_opt_state)
        dis_params = optax.apply_updates(state.dis_params, dis_updates)

        def gen_loss_fn(gen_params):
            fake_g = self.gen.apply(gen_params, inputs)
            d_fake = self.dis.apply(dis_params, fake_g)
            adv = gan_loss(d_fake, True)
            l1 = jnp.mean(jnp.abs(fake_g - targets))
            return adv + self.l1_weight * l1, (adv, l1)

        (gen_loss, (adv, l1)), gen_grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            state.gen_params
        )
        gen_updates, gen_opt_state = self.gen_tx.update(gen_grads, state.gen_opt_state)
        gen_params = optax.apply_updates(state.gen_params, gen_updates)

        new_state = GANTrainState(
            gen_params, dis_params, gen_opt_state, dis_opt_state, state.iteration + 1
        )
        return new_state, {"l_d": dis_loss, "l_g": adv, "l_l1": l1}


# ---------------------------------------------------------------------------
# EdgeConnect
# ---------------------------------------------------------------------------

class VunetTrainer:
    """Appearance-transfer trainer for the VUNet.

    The reference ships no VUNet training driver; this follows the original VUNet
    objective structure (Esser et al., CVPR 2018, which vunet/models.py implements):
    reconstruction of the target view + a KL-style alignment between the appearance
    posterior means (enc_down) and the shape decoder's autoregressive prior means
    (dec_down), with unit-variance Gaussians so KL reduces to 0.5 * ||mu_a - mu_s||^2.
    """

    def __init__(self, vunet=None, recon_weight: float = 1.0, kl_weight: float = 1.0,
                 lr: float = 1e-4):
        from future_urban_scene_generation_tpu.models.vunet import Vunet

        self.model = vunet or Vunet(vunet_256=False)
        self.recon_weight = recon_weight
        self.kl_weight = kl_weight
        self.tx = optax.adam(lr, b1=0.5, b2=0.9)

    def init(self, key, sample_shape, sample_app):
        params = self.model.init(
            {"params": key, "sample": key}, sample_shape, sample_app, cov=1.0
        )
        return params, self.tx.init(params)

    def train_step(self, params, opt_state, key, y_tilde, x_app, target):
        """y_tilde: dst sketch; x_app: appearance input (6ch); target: dst RGB, all
        [-1, 1] NHWC."""

        def loss_fn(p):
            out_up, skips_up = self.model.apply(
                p, x_app, method=self.model.forward_enc_up, deterministic=True
            )
            mu_app, z_app = self.model.apply(
                p, out_up, skips_up, method=self.model.forward_enc_down,
                deterministic=True, rngs={"sample": key},
            )
            out_dec, skips_dec = self.model.apply(
                p, y_tilde, method=self.model.forward_dec_up, deterministic=True
            )
            x_tilde, mu_shape, _ = self.model.apply(
                p, out_dec, skips_dec, z_app, method=self.model.forward_dec_down,
                deterministic=True, rngs={"sample": key},
            )
            recon = jnp.mean(jnp.abs(x_tilde - target))
            kl = sum(
                0.5 * jnp.mean((ma - jax.lax.stop_gradient(ms)) ** 2)
                for ma, ms in zip(mu_app, mu_shape)
            )
            total = self.recon_weight * recon + self.kl_weight * kl
            return total, (recon, kl)

        (loss, (recon, kl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = self.tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "recon": recon, "kl": kl}


class EdgeModelTrainer:
    """EdgeModel.process parity (edgeconnect/models.py:87-128): nsgan + 10x FM loss."""

    def __init__(self, fm_weight: float = 10.0, lr: float = 1e-4, gan_kind: str = "nsgan"):
        self.gen = ec.EdgeGenerator(spectral=True)
        self.dis = ec.ECDiscriminator(
            in_channels=2, use_sigmoid=gan_kind != "hinge", spectral=True
        )
        self.fm_weight = fm_weight
        self.gan_kind = gan_kind
        self.gen_tx, self.dis_tx = make_optimizers(lr)

    def init(self, key, hw=(256, 256)) -> GANTrainState:
        kg, kd = jax.random.split(key)
        h, w = hw
        gen_vars = self.gen.init(kg, jnp.zeros((1, h, w, 3)))
        gen_params = {"params": gen_vars["params"]}
        dis_vars = self.dis.init(kd, jnp.zeros((1, h, w, 2)))
        dis_params = {"params": dis_vars["params"]}
        return GANTrainState(
            gen_params, dis_params,
            self.gen_tx.init(gen_params), self.dis_tx.init(dis_params),
            jnp.int32(0),
            dis_state=dis_vars["spectral"],
            gen_state=gen_vars["spectral"],
        )

    def _dis_apply(self, dis_params, spectral, x, mutable=False):
        variables = {"params": dis_params["params"], "spectral": spectral}
        if mutable:
            return self.dis.apply(variables, x, mutable=["spectral"])
        return self.dis.apply(variables, x), None

    def _gen_apply(self, gen_params, spectral, images_gray, edges, masks, mutable=False):
        variables = {"params": gen_params["params"], "spectral": spectral}
        out = ec.edge_model_forward(
            variables, images_gray, edges, masks, generator=self.gen,
            mutable=["spectral"] if mutable else False,
        )
        return out if mutable else (out, None)

    def train_step(self, state, images_gray, edges, masks):
        gen_sp = state.gen_state
        outputs, _ = self._gen_apply(
            state.gen_params, gen_sp, images_gray, edges, masks
        )
        real_in = jnp.concatenate([images_gray, edges], axis=-1)
        spectral = state.dis_state

        def dis_loss_fn(dis_params):
            fake_in = jnp.concatenate(
                [images_gray, jax.lax.stop_gradient(outputs)], axis=-1
            )
            (d_real, _), _ = self._dis_apply(dis_params, spectral, real_in)
            (d_fake, _), _ = self._dis_apply(dis_params, spectral, fake_in)
            return (
                ec.adversarial_loss(d_real, True, True, self.gan_kind)
                + ec.adversarial_loss(d_fake, False, True, self.gan_kind)
            ) / 2.0

        dis_loss, dis_grads = jax.value_and_grad(dis_loss_fn)(state.dis_params)
        dis_updates, dis_opt_state = self.dis_tx.update(dis_grads, state.dis_opt_state)
        dis_params = optax.apply_updates(state.dis_params, dis_updates)

        def gen_loss_fn(gen_params):
            out_g, _ = self._gen_apply(gen_params, gen_sp, images_gray, edges, masks)
            fake_in = jnp.concatenate([images_gray, out_g], axis=-1)
            (d_fake, fake_feat), _ = self._dis_apply(dis_params, spectral, fake_in)
            (_, real_feat), _ = self._dis_apply(dis_params, spectral, real_in)
            adv = ec.adversarial_loss(d_fake, True, False, self.gan_kind)
            fm = sum(
                jnp.mean(jnp.abs(f - jax.lax.stop_gradient(r)))
                for f, r in zip(fake_feat, real_feat)
            )
            return adv + self.fm_weight * fm, (adv, fm)

        (gen_total, (adv, fm)), gen_grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            state.gen_params
        )
        gen_updates, gen_opt_state = self.gen_tx.update(gen_grads, state.gen_opt_state)
        gen_params = optax.apply_updates(state.gen_params, gen_updates)

        # Advance the power iterations once per step (torch advances per forward;
        # both converge to the same dominant singular pair — PARITY.md §12).
        _, new_sp = self._dis_apply(dis_params, spectral, real_in, mutable=True)
        _, new_gen_sp = self._gen_apply(
            gen_params, gen_sp, images_gray, edges, masks, mutable=True
        )

        new_state = GANTrainState(
            gen_params, dis_params, gen_opt_state, dis_opt_state, state.iteration + 1,
            dis_state=new_sp["spectral"],
            gen_state=new_gen_sp["spectral"],
        )
        return new_state, {"l_d1": dis_loss, "l_g1": adv, "l_fm": fm}


class InpaintingModelTrainer:
    """InpaintingModel.process parity (edgeconnect/models.py:184-234)."""

    def __init__(
        self,
        adv_weight: float = 0.01,
        l1_weight: float = 1.0,
        content_weight: float = 1.0,
        style_weight: float = 1.0,
        lr: float = 1e-4,
        gan_kind: str = "nsgan",
    ):
        self.gen = ec.InpaintGenerator()
        self.dis = ec.ECDiscriminator(
            in_channels=3, use_sigmoid=gan_kind != "hinge", spectral=True
        )
        self.vgg = VGG19Features()
        self.weights = (adv_weight, l1_weight, content_weight, style_weight)
        self.gan_kind = gan_kind
        self.gen_tx, self.dis_tx = make_optimizers(lr)

    def init(self, key, vgg_params, hw=(256, 256)) -> GANTrainState:
        kg, kd = jax.random.split(key)
        h, w = hw
        gen_params = self.gen.init(kg, jnp.zeros((1, h, w, 4)))
        dis_vars = self.dis.init(kd, jnp.zeros((1, h, w, 3)))
        dis_params = {"params": dis_vars["params"]}
        self.vgg_params = vgg_params
        return GANTrainState(
            gen_params, dis_params,
            self.gen_tx.init(gen_params), self.dis_tx.init(dis_params),
            jnp.int32(0),
            dis_state=dis_vars["spectral"],
        )

    def _dis_apply(self, dis_params, spectral, x, mutable=False):
        variables = {"params": dis_params["params"], "spectral": spectral}
        if mutable:
            return self.dis.apply(variables, x, mutable=["spectral"])
        return self.dis.apply(variables, x), None

    def train_step(self, state, vgg_params, images, edges, masks):
        adv_w, l1_w, content_w, style_w = self.weights
        outputs = ec.inpaint_model_forward(state.gen_params, images, edges, masks,
                                           generator=self.gen)
        spectral = state.dis_state

        def dis_loss_fn(dis_params):
            (d_real, _), _ = self._dis_apply(dis_params, spectral, images)
            (d_fake, _), _ = self._dis_apply(
                dis_params, spectral, jax.lax.stop_gradient(outputs)
            )
            return (
                ec.adversarial_loss(d_real, True, True, self.gan_kind)
                + ec.adversarial_loss(d_fake, False, True, self.gan_kind)
            ) / 2.0

        dis_loss, dis_grads = jax.value_and_grad(dis_loss_fn)(state.dis_params)
        dis_updates, dis_opt_state = self.dis_tx.update(dis_grads, state.dis_opt_state)
        dis_params = optax.apply_updates(state.dis_params, dis_updates)

        def gen_loss_fn(gen_params):
            out_g = ec.inpaint_model_forward(gen_params, images, edges, masks,
                                             generator=self.gen)
            (d_fake, _), _ = self._dis_apply(dis_params, spectral, out_g)
            adv = ec.adversarial_loss(d_fake, True, False, self.gan_kind) * adv_w
            l1 = jnp.mean(jnp.abs(out_g - images)) * l1_w / jnp.mean(masks)
            feats_x = self.vgg.apply(vgg_params, out_g)
            feats_y = self.vgg.apply(vgg_params, images)
            content = ec.perceptual_loss(feats_x, feats_y) * content_w
            feats_xm = self.vgg.apply(vgg_params, out_g * masks)
            feats_ym = self.vgg.apply(vgg_params, images * masks)
            style = ec.style_loss(feats_xm, feats_ym) * style_w
            return adv + l1 + content + style, (adv, l1, content, style)

        (gen_total, aux), gen_grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            state.gen_params
        )
        adv, l1, content, style = aux
        gen_updates, gen_opt_state = self.gen_tx.update(gen_grads, state.gen_opt_state)
        gen_params = optax.apply_updates(state.gen_params, gen_updates)

        # Advance the D's power iteration once per step (PARITY.md §12).
        _, new_sp = self._dis_apply(dis_params, spectral, images, mutable=True)

        new_state = GANTrainState(
            gen_params, dis_params, gen_opt_state, dis_opt_state, state.iteration + 1,
            dis_state=new_sp["spectral"],
        )
        return new_state, {
            "l_d2": dis_loss, "l_g2": adv, "l_l1": l1, "l_per": content, "l_sty": style,
        }
