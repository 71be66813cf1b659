from rpg_open_remode_tpu.utils import se3, camera, interp
