"""humanvid-tpu: TPU-native (JAX/XLA/Pallas) camera-controllable human image animation.

A from-scratch rebuild of the capabilities of HumanVid's CamAnimate
(reference: zhenzhiwang/HumanVid) designed TPU-first:

- NHWC layouts everywhere (XLA:TPU's preferred conv layout), video tensors are
  ``(batch, frames, height, width, channels)``.
- The reference's monkey-patched mutable attention "banks"
  (reference ``src/models/mutual_self_attention.py``) are replaced by an explicit
  functional pytree of reference features produced by :class:`models.ReferenceNet`
  and consumed positionally by :class:`models.UNet3D`.
- Classifier-free-guidance "uncond rows self-attend only" semantics are expressed
  as an additive attention bias instead of a masked recompute.
- All hot paths are jittable; the denoising loop is a ``lax`` loop; context windows
  are a batch axis shardable over a device mesh.
"""

__version__ = "0.1.0"
