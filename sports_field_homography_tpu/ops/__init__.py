from .resize import resize_bilinear, resize_nearest, upsample2x_bilinear
from .interval_warp import (
    IntervalTable,
    build_interval_table,
    warp_nearest_interval,
    warp_bilinear_interval,
)
from .fold_bn import fold_batchnorm
