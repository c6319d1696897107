from tpuimage.core.dtypes import (
    saturate_u8,
    round_half_even,
    descale,
    f32,
    i32,
)
from tpuimage.core.borders import pad2d, BORDER_REFLECT_101, BORDER_REPLICATE, BORDER_CONSTANT, BORDER_REFLECT
