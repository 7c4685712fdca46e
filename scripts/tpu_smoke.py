"""One-claim TPU smoke: every engine, the node (both range modes), and the
cross-backend conformance check on real hardware.

The CPU test suite runs everything in interpret mode; this script is the
real-hardware sweep (one TPU claim, bounded by an internal alarm).

Usage: python scripts/tpu_smoke.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_guard import clear_axon_env, install_alarm

clear_axon_env()
install_alarm(560)

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))


def main():
    import jax
    import jax.numpy as jnp

    from oracle import smooth_random_image

    from mrs_optic_flow_tpu.models import make_engine
    from mrs_optic_flow_tpu.ops import conformance
    from mrs_optic_flow_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(1)

    # --- engines 3 / 4 / 5 ------------------------------------------------
    f0 = (smooth_random_image(rng, 480, cutoff=0.35) * 127 + 128).astype(np.uint8)
    f1 = np.roll(f0, (2, -5), (0, 1))
    for method in (3, 4, 5):
        eng = make_engine(method)  # reference-default geometry
        state = eng.set_im_prev(eng.init_state(), jnp.asarray(f0, jnp.float32))
        _, res = eng.step(state, jnp.asarray(f1, jnp.float32))
        med = np.nanmedian(np.atleast_2d(np.asarray(res.shifts)), axis=0)
        assert np.abs(med - [-5, 2]).max() < 1.0, (method, med)
        print(f"method {method}: median shift {med} OK", flush=True)

    # --- SAD kernel: fused Pallas vs lax.scan agree on real hardware ------
    # (methods 3/5 above already ran the Pallas default end-to-end; this
    # pins the two lowerings against each other at an odd geometry)
    from mrs_optic_flow_tpu.ops.block_matching import sad_search, sad_search_pallas

    blocks = jnp.asarray(rng.integers(0, 255, size=(5, 24, 24)), jnp.float32)
    regions = jnp.asarray(rng.integers(0, 255, size=(5, 38, 38)), jnp.float32)
    sad_a = sad_search(blocks, regions, block_size=24, scan_radius=7)
    sad_b = sad_search_pallas(blocks, regions, block_size=24, scan_radius=7)
    np.testing.assert_allclose(np.asarray(sad_a), np.asarray(sad_b), rtol=1e-6)
    print("SAD pallas == scan OK", flush=True)

    # config-drift guard: the shipped defaults must stay on the path the
    # published measurement found fastest (docs/PERFORMANCE.md SAD row;
    # scripts/tune_sad_kernel.py re-measures and fails if the claim drifts)
    from mrs_optic_flow_tpu.models import BlockMethodConfig, FastSpacedBMConfig

    assert BlockMethodConfig().use_pallas and FastSpacedBMConfig().use_pallas, (
        "SAD use_pallas defaults no longer match the published measurement — "
        "re-run scripts/tune_sad_kernel.py and update docs/PERFORMANCE.md"
    )

    # --- scale-rotation (pure-numpy zoom to avoid a cv2 dependency) -------
    from mrs_optic_flow_tpu.models import ScaleRotationConfig, ScaleRotationEstimator
    import scipy.ndimage as ndi

    n = 128
    sre = ScaleRotationEstimator(ScaleRotationConfig(resolution=n, magnitude=20.0))
    g0 = smooth_random_image(rng, n)
    g1 = ndi.rotate(g0, 8.0, reshape=False, order=1, mode="nearest")
    r = sre.step_batch(jnp.asarray(g0)[None], jnp.asarray(g1)[None])
    rot_deg = np.rad2deg(float(r.rotation[0]))
    assert abs(rot_deg - 8.0) < 1.5, rot_deg
    print(f"scale-rotation: {rot_deg:.2f} deg (true 8.0) OK", flush=True)

    # --- node, both range modes ------------------------------------------
    from mrs_optic_flow_tpu.config import load_config
    from mrs_optic_flow_tpu.runtime import FrameStream, OpticFlowNode, SyntheticScene

    published = []
    for lr_mode in ("always_off", "always_on"):
        node = OpticFlowNode(
            load_config(overrides={"mrs_optic_flow": {"long_range_mode": lr_mode}}),
            publish=lambda t, m: published.append((t, m)), log=lambda s: None,
        )
        node.set_transforms((0.0, 0.0, 0.0, 1.0))
        scene = SyntheticScene(uav_height=2.0)
        stream = FrameStream(node)
        scene.trajectory_events(stream, velocity=(0.8, -0.3), n_frames=6, dt=0.05)
        stream.run()
    main_twists = [m for t, m in published if t == "velocity_out"]
    lr_twists = [m for t, m in published if t == "velocity_out_longrange"]
    assert main_twists and lr_twists, (len(main_twists), len(lr_twists))
    v = main_twists[-1].linear
    assert abs(v[0] - 0.8) < 0.15 and abs(v[1] + 0.3) < 0.15, v
    vlr = lr_twists[-1].linear
    assert abs(vlr[0] - 0.8) < 0.3 and abs(vlr[1] + 0.3) < 0.3, vlr
    print(f"node short-range v={v[:2]} long-range v={vlr[:2]} OK", flush=True)

    # --- tpu.host_preprocess: native gray+crop feeds the pre-cropped
    # device program; same twists as device preprocessing ------------------
    published_hp = []
    node = OpticFlowNode(
        load_config(overrides={"tpu": {"host_preprocess": True}}),
        publish=lambda t, m: published_hp.append((t, m)), log=lambda s: None,
    )
    node.set_transforms((0.0, 0.0, 0.0, 1.0))
    scene = SyntheticScene(uav_height=2.0)
    stream = FrameStream(node)
    scene.trajectory_events(stream, velocity=(0.8, -0.3), n_frames=6, dt=0.05)
    for ev in stream._events:
        if ev.kind == "image":  # host path needs uint8 BGR frames
            q = np.clip(np.round(ev.msg.data), 0, 255).astype(np.uint8)
            ev.msg.data = np.repeat(q[:, :, None], 3, axis=2)
    stream.run()
    vhp = [m for t, m in published_hp if t == "velocity_out"][-1].linear
    assert abs(vhp[0] - 0.8) < 0.15 and abs(vhp[1] + 0.3) < 0.15, vhp
    print(f"host_preprocess v={vhp[:2]} OK", flush=True)

    # --- frames-kernel geometry sweep (Mosaic edge cases only show on
    # real hardware; all verified on v5e) ---------------------------------
    from mrs_optic_flow_tpu.ops.pallas_kernels import phase_correlate_frames_pallas

    for frame, patch in ((256, 64), (384, 96), (640, 160), (480, 240), (240, 80)):
        grng = np.random.default_rng(frame)
        g0 = (smooth_random_image(grng, frame, cutoff=0.35) * 127 + 128).astype(np.uint8)
        g1 = np.roll(g0, (3, -4), (0, 1))
        sh, _ = phase_correlate_frames_pallas(
            jnp.asarray(g1)[None], jnp.asarray(g0)[None], patch=patch,
            search_radius=min(55, patch // 2 - 4), exact_inputs=True,
        )
        med = np.nanmedian(np.asarray(sh)[0], axis=0)
        assert np.abs(med - [-4, 3]).max() < 0.5, (frame, patch, med)
    print("frames-kernel geometry sweep OK", flush=True)

    # --- cross-backend conformance ---------------------------------------
    curr_p = jnp.asarray(
        np.stack([np.roll(smooth_random_image(rng, 120), 3, 1) for _ in range(4)])
    )
    prev_p = jnp.asarray(np.stack([np.roll(np.asarray(curr_p[i]), -3, 1)
                                   for i in range(4)]))
    diffs = conformance.check(curr_p, prev_p)
    print("conformance:", {k: round(v, 5) for k, v in diffs.items()}, flush=True)
    print("TPU SMOKE PASSED")


if __name__ == "__main__":
    main()
