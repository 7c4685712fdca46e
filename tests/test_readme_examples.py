"""The README quick-start snippets must actually run."""

import numpy as np

import jax.numpy as jnp


def test_quickstart_op_level():
    import mrs_optic_flow_tpu as oft
    from mrs_optic_flow_tpu.ops.preprocess import patchify

    prev = np.random.default_rng(0).random((480, 480)).astype(np.float32)
    curr = np.roll(prev, (3, -7), axis=(0, 1))
    shifts, response = oft.phase_correlate_field(
        patchify(jnp.asarray(curr), 120), patchify(jnp.asarray(prev), 120)
    )
    assert np.all(np.abs(np.asarray(shifts) - np.array([-7, 3])) < 0.5)


def test_quickstart_engine_level(rng):
    from mrs_optic_flow_tpu.models import FftMethod, FftMethodConfig

    engine = FftMethod(FftMethodConfig())
    state = engine.init_state()
    frame = rng.random((480, 480)).astype(np.float32)
    state, result = engine.step(state, jnp.asarray(frame))
    assert np.asarray(result.shifts).shape == (16, 2)
    batch = jnp.asarray(np.stack([frame, frame]))
    res = engine.step_batch(batch, batch)
    assert np.asarray(res.shifts).shape == (2, 16, 2)


def test_lazy_top_level_exports():
    import mrs_optic_flow_tpu as oft

    assert oft.FftMethod is not None
    assert oft.OpticFlowNode is not None
    assert callable(oft.load_config)
    import pytest

    with pytest.raises(AttributeError):
        oft.does_not_exist
