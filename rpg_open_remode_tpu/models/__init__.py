from rpg_open_remode_tpu.models.state import SeedState, SceneParams
from rpg_open_remode_tpu.models.depthmap import Depthmap
from rpg_open_remode_tpu.models.node import DepthmapNode
from rpg_open_remode_tpu.models.multikeyframe import (BatchedDepthmap, MultiKeyframeNode)
