"""One-off: live_752x480 accuracy after the warp-gate relaxation."""
import json
from eval import eval_fixed_keyframe
r = eval_fixed_keyframe(752, 480,
                        dict(fx=481.2, fy=-480.0, cx=375.5, cy=239.5),
                        n_frames=120, step=0.023)
print(json.dumps({k: v for k, v in r.items() if not isinstance(v, list)}))
