"""Vector filtering & statistics toolkit (``src/utilityFunctions.cpp``).

The reference's live node path filters via homography RANSAC, but the
utility toolkit (allsac / ransacMean / bounds / speed statistics /
``estimateTranRotVvel``) is part of the public surface
(``include/utilityFunctions.h``) and config-selectable
(``config/default.yaml:33`` filter_method) — rebuilt here mask-based and
jittable.
"""

from mrs_optic_flow_tpu.filters.allsac import (  # noqa: F401
    allsac_mean,
    allsac_mean_1d,
    point_mean,
    ransac_mean,
    rotate_2d,
    bound_abs_mask,
    bound_radius_mask,
)
from mrs_optic_flow_tpu.filters.stats import SpeedBox, StatData, analyze_speeds  # noqa: F401
from mrs_optic_flow_tpu.filters.tran_rot_vvel import estimate_tran_rot_vvel  # noqa: F401
