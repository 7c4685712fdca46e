"""Host-side utilities."""

from mrs_optic_flow_tpu.utils.quat_np import (  # noqa: F401
    np_quat_from_rpy,
    np_quat_inverse,
    np_quat_multiply,
    np_rpy_from_quat,
)
