"""future_urban_scene_generation_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
future urban scene generation through vehicle synthesis.

Re-designed from scratch for TPU hardware with the capabilities of the ICPR 2020
"Future Urban Scene Generation Through Vehicle Synthesis" reference pipeline
(upstream: alexj94/future_urban_scene_generation):

  * perception: CAD-shape classification (VGG19 head) + 12-keypoint localization
    (stacked hourglass), batched over vehicles;
  * pose: Levenberg–Marquardt PnP restarted from 4 canonical rotations, expressed as a
    single jitted `lax.while_loop` with `jax.jacfwd` Jacobians and vmapped restarts;
  * geometry: homography DLT, trajectory→metric ground-plane conversion, future pose
    rollout;
  * rendering: a z-buffer triangle rasterizer producing normal-colored 2.5D sketches
    (replaces the reference's Open3D GL renderer), and analytic polygon-coverage plane
    visibility (replaces cv2.fillPoly painter's algorithm);
  * synthesis: ICN (Warp&Learn) and variational U-Net generators, EdgeConnect two-stage
    inpainting — all as Flax modules lowered by XLA, NHWC, bfloat16-capable;
  * runtime: `jax.sharding.Mesh` + shard_map parallelism over (vehicles × steps),
    host↔device pipelining, Orbax checkpoints and a PyTorch state-dict converter.

Everything in the compute path is fixed-shape and jittable; host Python exists only at
the edges (video decode, tracking-file parsing, PNG writing, UI).
"""

__version__ = "0.1.0"

from future_urban_scene_generation_tpu import ops  # noqa: F401
from future_urban_scene_generation_tpu import geometry  # noqa: F401
from future_urban_scene_generation_tpu import utils  # noqa: F401
