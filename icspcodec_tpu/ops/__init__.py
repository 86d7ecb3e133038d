from .transforms import fdct, idct  # noqa: F401
from .quant import quant_block, dequant_block, c_div, c_trunc, ac_flag  # noqa: F401
from .scanorder import zigzag, izigzag  # noqa: F401
from .medians import median3, median3_mv_y  # noqa: F401
from .pad import pad_image  # noqa: F401
from .me import spiral_search, gather_pred, mv_diff_field  # noqa: F401
