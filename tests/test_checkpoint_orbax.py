"""Orbax production checkpoint backend: sharded save/restore + driver smoke.

The default backend stays reference-compatible per-module msgpack; orbax is
the multi-host-scalable path (async writes, shardings preserved — each
process writes its own ZeRO shard). Covered here on the 8-device virtual CPU
mesh per SURVEY §4's test strategy.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from humanvid_tpu.train.checkpoint import OrbaxCheckpointer  # noqa: E402


def test_orbax_sharded_roundtrip(tmp_path):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from humanvid_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    shard = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    tree = {
        "params": {"w": jax.device_put(jnp.arange(32.0).reshape(8, 4), shard),
                   "b": jax.device_put(jnp.ones((3,)), repl)},
        "opt_state": {"mu": jax.device_put(jnp.full((8, 4), 0.25), shard)},
    }

    ckpt = OrbaxCheckpointer(str(tmp_path / "orbax"), keep=2)
    for step in (1, 2, 3):
        ckpt.save(step, jax.tree.map(lambda a: a * step, tree))
    ckpt.wait()
    assert ckpt.latest_step() == 3

    restored = ckpt.restore(3, tree)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.arange(32.0).reshape(8, 4) * 3)
    np.testing.assert_array_equal(
        np.asarray(restored["opt_state"]["mu"]), np.full((8, 4), 0.75))
    # shardings restored onto the template's layout
    assert restored["params"]["w"].sharding.is_equivalent_to(shard, 2)

    # keep=2 rotation: step 1 is gone
    with pytest.raises(Exception):
        ckpt.restore(1, tree)
    ckpt.close()


def test_train_driver_orbax_backend(tmp_path):
    """Stage-1 smoke with solver.checkpoint_backend: orbax — checkpoints land
    in the orbax manager (no msgpack files), and a resume restores them."""
    import json

    import yaml

    from humanvid_tpu.data.video_io import save_video
    from scripts.train_stage_1 import run_training

    videos = tmp_path / "src" / "videos"
    dwpose = tmp_path / "src" / "dwpose"
    camera = tmp_path / "src" / "camera"
    for d in (videos, dwpose, camera):
        d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    F, H, W = 10, 48, 32
    for name in ("a", "b"):
        save_video(rng.random((F, H, W, 3)).astype(np.float32),
                   str(videos / f"{name}.mp4"), fps=8.0)
        save_video(rng.random((F, H, W, 3)).astype(np.float32),
                   str(dwpose / f"{name}.mp4"), fps=8.0)
        lines = [f"{i} {0.01 * i} 0 0 0 0 0 1 1.0 1.788 1.0" for i in range(F)]
        (camera / f"{name}.txt").write_text("\n".join(lines) + "\n")
    meta = [{"video_path": str(videos / f"{n}.mp4"),
             "kps_path": str(dwpose / f"{n}.mp4"),
             "start_frame": 0, "end_frame": F} for n in ("a", "b")]
    meta_path = tmp_path / "meta.json"
    meta_path.write_text(json.dumps(meta))

    def make_cfg(resume):
        cfg = {
            "model": "tiny",
            "data": {"train_bs": 2, "train_size_small": 32,
                     "train_size_large": 48, "horizontal_meta": [],
                     "vertical_meta": [str(meta_path)], "sample_margin": 3,
                     "num_workers": 2},
            "solver": {"gradient_accumulation_steps": 1,
                       "enable_gradient_checkpointing": False,
                       "max_train_steps": 4 if resume else 2,
                       "max_grad_norm": 1.0, "learning_rate": 1.0e-4,
                       "lr_warmup_steps": 0, "lr_scheduler": "constant",
                       "adam_beta1": 0.9, "adam_beta2": 0.999,
                       "adam_weight_decay": 1.0e-2, "adam_epsilon": 1.0e-8,
                       "checkpoint_backend": "orbax"},
            "val": {"validation_steps": 0},
            "uncond_ratio": 0.1, "noise_offset": 0.05, "snr_gamma": 5.0,
            "seed": 0, "checkpointing_steps": 2,
            "exp_name": "orbax_smoke", "output_dir": str(tmp_path / "out"),
        }
        if resume:
            cfg["resume_from_checkpoint"] = str(
                tmp_path / "out" / "orbax_smoke")
        path = tmp_path / f"cfg_{int(resume)}.yaml"
        path.write_text(yaml.safe_dump(cfg))
        return str(path)

    run_training(1, ["--config", make_cfg(False), "--dtype", "float32"])
    exp = tmp_path / "out" / "orbax_smoke"
    ckpt = OrbaxCheckpointer(str(exp / "orbax"))
    assert ckpt.latest_step() == 2
    ckpt.close()
    # no msgpack module checkpoints in orbax mode
    assert not any(f.endswith(".msgpack") for f in os.listdir(exp))

    # resume picks up at the saved step and continues to 4
    run_training(1, ["--config", make_cfg(True), "--dtype", "float32"])
    ckpt = OrbaxCheckpointer(str(exp / "orbax"))
    assert ckpt.latest_step() == 4
    ckpt.close()
