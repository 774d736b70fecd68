from .resize import resize_bilinear, resize_nearest, upsample2x_bilinear
from .interval_warp import (
    IntervalTable,
    build_interval_table,
    warp_nearest_interval,
    warp_bilinear_interval,
)
from .fold_bn import fold_batchnorm
from .conv3x3_pallas import (
    conv3x3,
    wgrad3x3,
    pack_weights,
    pack_pairs,
    unpack_pairs,
    supports_conv3x3,
    supports_packed,
)
from .double_conv import (
    double_conv_train,
    double_conv_eval,
    supports_double_conv,
    supports_double_conv_eval,
)
from .deconv_pallas import deconv2x2_packed, supports_deconv_packed
