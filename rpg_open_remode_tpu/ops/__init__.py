from rpg_open_remode_tpu.ops import (
    triangulation,
    seed_init,
    seed_check,
    seed_update,
    epipolar,
    denoise,
    reduction,
)
