"""Checkpoint conversion CLI: reference .pth / upstream torch weights -> our
msgpack param trees (and back to reference .pth layout).

Migration path for users of the PyTorch reference implementation
(``src/utils/util.py:17-44`` checkpoint split + HuggingFace uploads at
zhenzhiwang/humanvid):

    # torch -> humanvid-tpu (writes <out_dir>/<component>-0.msgpack per module)
    python scripts/convert_weights.py import \\
        --base_model pretrained_weights/stable-diffusion-v1-5 \\
        --vae pretrained_weights/sd-vae-ft-mse \\
        --image_encoder pretrained_weights/image_encoder \\
        --denoising_unet denoising_unet-30000.pth \\
        --reference_unet reference_unet-30000.pth \\
        --pose_guider pose_guider-30000.pth \\
        --camera_encoder camera_pose_encoder-30000.pth \\
        --motion_module motion_module-20000.pth \\
        --out_dir converted/

    # humanvid-tpu -> reference .pth layout
    python scripts/convert_weights.py export --ckpt_dir converted --step 0 \\
        --out_dir exported/
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    imp = sub.add_parser("import")
    imp.add_argument("--base_model", default="")
    imp.add_argument("--vae", default="")
    imp.add_argument("--image_encoder", default="")
    imp.add_argument("--denoising_unet", default="")
    imp.add_argument("--reference_unet", default="")
    imp.add_argument("--pose_guider", default="")
    imp.add_argument("--camera_encoder", default="")
    imp.add_argument("--motion_module", default="")
    imp.add_argument("--out_dir", required=True)
    imp.add_argument("--stage", type=int, default=2,
                     help="2 = motion modules on (inference_v2)")

    exp = sub.add_parser("export")
    exp.add_argument("--ckpt_dir", required=True)
    exp.add_argument("--step", type=int, required=True)
    exp.add_argument("--out_dir", required=True)
    for s in (imp, exp):
        s.add_argument("--tiny", action="store_true",
                       help="tiny topology (CLI smoke tests)")
    args = p.parse_args()

    jax.config.update("jax_platforms", "cpu")  # conversion is host-side

    from humanvid_tpu.pipelines.system import CamAnimate, CamAnimateConfig
    from humanvid_tpu.train.checkpoint import load_checkpoint, save_train_checkpoint
    from humanvid_tpu.utils.config import ConfigDict
    from humanvid_tpu.utils.weights import load_pretrained_params

    if args.tiny:
        from humanvid_tpu.pipelines.system import tiny_config
        system = CamAnimate(tiny_config())
    else:
        system = CamAnimate(CamAnimateConfig())

    if args.cmd == "import":
        cfg = ConfigDict.wrap({
            "base_model_path": args.base_model,
            "vae_model_path": args.vae,
            "image_encoder_path": args.image_encoder,
            "denoising_unet_path": args.denoising_unet,
            "reference_unet_path": args.reference_unet,
            "pose_guider_path": args.pose_guider,
            "camera_pose_encoder_path": args.camera_encoder,
            "motion_module_path": args.motion_module,
        })
        params = load_pretrained_params(system, cfg, abstract=True)
        os.makedirs(args.out_dir, exist_ok=True)
        paths = save_train_checkpoint(
            args.out_dir, params, step=0,
            components=list(params.keys()), total_limit=None,
        )
        for path in paths:
            print("wrote", path)
        return

    from humanvid_tpu.train.checkpoint import export_reference_pth

    params = system.init_params(jax.random.PRNGKey(0), 64, 64, frames=2, abstract=True)
    loaded = {}
    for name in ("reference_unet", "denoising_unet", "pose_guider", "camera_encoder"):
        path = os.path.join(args.ckpt_dir, f"{name}-{args.step}.msgpack")
        if os.path.exists(path):
            loaded[name] = load_checkpoint(path, params[name])
    for path in export_reference_pth(loaded, args.out_dir, args.step):
        print("wrote", path)


if __name__ == "__main__":
    main()
