import os

import numpy as np
import pytest

from humanvid_tpu.data.camera import (
    Camera,
    get_relative_pose,
    intrinsics_vector,
    ray_condition,
    static_camera,
)

REF = "/root/reference/src/dataset/dance_image_h_v_camera.py"


def _make_cams(n, rng, source="pexels", size=(512, 896)):
    cams = []
    entries = []
    for i in range(n):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        entry = [float(i), *rng.normal(size=3), *q, 0.9, 1.6, 1.1]
        entries.append(entry)
        cams.append(Camera.from_entry(entry, source, image_size=size))
    return cams, entries


def test_first_relative_pose_is_identity():
    cams, _ = _make_cams(4, np.random.default_rng(0))
    rel = get_relative_pose(cams)
    np.testing.assert_allclose(rel[0], np.eye(4), atol=1e-6)


def test_static_camera_identity_and_focal():
    cams = static_camera((512, 896), 3)  # vertical: w < h
    assert len(cams) == 3
    np.testing.assert_allclose(cams[0].c2w, np.eye(4), atol=1e-9)
    assert cams[0].fy == pytest.approx(1.0)
    assert cams[0].fx == pytest.approx(1.788079 * 896 / 512, rel=1e-6) or cams[0].fx == pytest.approx(896 / 512)
    cams_h = static_camera((896, 512), 1)  # horizontal
    assert cams_h[0].fx == pytest.approx(1.0)


def test_plucker_rays_unit_direction_and_orthogonal_moment():
    cams, _ = _make_cams(5, np.random.default_rng(1))
    rel = get_relative_pose(cams)[1:]
    K = intrinsics_vector(cams[1:], (64, 112))
    plk = ray_condition(K, rel, 112, 64)
    assert plk.shape == (4, 112, 64, 6)
    m, d = plk[..., :3], plk[..., 3:]
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # Plücker constraint: moment is orthogonal to direction
    np.testing.assert_allclose((m * d).sum(-1), 0.0, atol=1e-5)


@pytest.mark.skipif(not os.path.exists(REF), reason="reference tree not mounted")
def test_parity_with_reference_implementation():
    """Golden parity vs the reference Camera/ray_condition (exec'd in isolation).

    Note: V (number of views) must not be 3 — the reference calls torch.cross
    without ``dim`` so V==3 makes torch pick the view axis (a latent reference
    bug we do not replicate).
    """
    torch = pytest.importorskip("torch")
    import packaging.version as pver
    import io

    src = open(REF).read().splitlines()
    ns = {
        "np": np, "torch": torch, "pver": pver,
        "open": lambda *a, **k: io.StringIO(),
    }
    exec("\n".join(src[16:130]), ns)  # class Camera .. ray_condition
    ref_camera, ref_ray = ns["Camera"], ns["ray_condition"]
    rel_lines = "\n".join(l[4:] for l in src[204:222])
    ns2 = {"np": np}
    exec(
        "def ref_get_relative_pose(self, cam_params):\n"
        + "\n".join("    " + l for l in rel_lines.splitlines()[1:]),
        ns2,
    )

    rng = np.random.default_rng(42)
    for source in ("pexels_x", "blender_y", "test"):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        entry = [0.0, *rng.normal(size=3), *q, 0.9, 1.6, 1.3]
        ref = ref_camera(entry, source, image_scale=(512, 896))
        mine = Camera.from_entry(entry, source, image_size=(512, 896))
        np.testing.assert_allclose(ref.c2w_mat, mine.c2w, atol=1e-12)
        np.testing.assert_allclose(ref.w2c_mat, mine.w2c, atol=1e-12)
        assert ref.fx == pytest.approx(mine.fx) and ref.fy == pytest.approx(mine.fy)

    cams, entries = _make_cams(6, rng)
    ref_cams = [ref_camera(e, "pexels", image_scale=(512, 896)) for e in entries]

    class D:
        zero_t_first_frame = True

    rel_ref = ns2["ref_get_relative_pose"](D(), ref_cams)
    rel = get_relative_pose(cams)
    np.testing.assert_allclose(rel_ref, rel, atol=1e-6)

    K = intrinsics_vector(cams[1:], (64, 112))
    plk = ray_condition(K, rel[1:], 112, 64)
    plk_ref = ref_ray(
        torch.tensor(K)[None], torch.tensor(rel[1:].astype(np.float32))[None],
        112, 64, device="cpu",
    )[0].numpy()
    np.testing.assert_allclose(plk, plk_ref, atol=2e-5)
