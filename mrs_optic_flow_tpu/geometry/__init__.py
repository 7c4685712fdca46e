"""Geometry / motion decomposition (layer L4 of the reference).

Rebuilds the OpenCV-calib3d + tf2 geometry chain of ``src/optic_flow.cpp``
(``getRT`` :515-774, ``get2DT`` :388-510, ``getInliers`` :335-358) as
fixed-shape, mask-based JAX — N=16 grid points, trivially on-device, jittable
end-to-end with the flow engines.
"""

from mrs_optic_flow_tpu.geometry.rotations import (  # noqa: F401
    quat_from_matrix,
    matrix_from_quat,
    quat_from_axis_angle,
    quat_axis_angle,
    quat_from_rpy,
    rpy_from_matrix,
    quat_angle,
    quat_inverse,
    quat_rotate,
)
from mrs_optic_flow_tpu.geometry.undistort import undistort_points  # noqa: F401
from mrs_optic_flow_tpu.geometry.homography import (  # noqa: F401
    find_homography_ransac,
    decompose_homography,
)
from mrs_optic_flow_tpu.geometry.motion import get_rt, get_2dt, get_inliers  # noqa: F401
