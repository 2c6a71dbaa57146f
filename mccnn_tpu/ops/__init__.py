from mccnn_tpu.ops.cost_volume import cost_volume_pair, pad_disparities  # noqa: F401
from mccnn_tpu.ops.cbca import compute_arms, cbca  # noqa: F401
from mccnn_tpu.ops.cbca_mxu import cbca_mxu  # noqa: F401
from mccnn_tpu.ops.cbca_pallas import cbca_pallas  # noqa: F401
from mccnn_tpu.ops.cost_volume_pallas import band_pair_pallas  # noqa: F401
from mccnn_tpu.ops.sgm import sgm  # noqa: F401
from mccnn_tpu.ops.wta import wta_disparity  # noqa: F401
from mccnn_tpu.ops.lr_check import lr_consistency_interpolate  # noqa: F401
from mccnn_tpu.ops.subpixel import subpixel_enhance  # noqa: F401
from mccnn_tpu.ops.filters import bilateral_filter, median_filter  # noqa: F401
