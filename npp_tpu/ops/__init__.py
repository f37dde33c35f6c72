from npp_tpu.ops.primitives import OPS, make_op  # noqa: F401
from npp_tpu.ops.resize import (  # noqa: F401
    resize_bilinear,
    resize_nearest,
    resize_scale,
)
