import time, numpy as np, jax, jax.numpy as jnp, cv2
from video_segment_tpu.core import oversegmentation as ov
cap = cv2.VideoCapture('/root/reference/video_example/test_video.MOV')
frames=[cap.read()[1] for _ in range(21)]
vol = jnp.asarray(np.stack(frames).astype(np.float32)/255.0)
params = ov.OversegParams(min_region_size=100)
t0=time.time(); res = ov.oversegment(vol, params=params); lab=np.asarray(res.label)
print("480p compile+first", round(time.time()-t0,1), "regions", len(np.unique(lab)), flush=True)
t0=time.time(); res = ov.oversegment(vol, params=params); np.asarray(res.label)
print("480p steady", round(time.time()-t0,2), flush=True)
# try a mid-size shape to probe the large-shape wedge
import numpy as np
big = jnp.asarray(np.random.default_rng(0).random((21, 640, 384, 3), dtype=np.float32))
t0=time.time(); res = ov.oversegment(big, params=params); np.asarray(res.label)
print("640x384 compile+first", round(time.time()-t0,1), flush=True)
t0=time.time(); res = ov.oversegment(big, params=params); np.asarray(res.label)
print("640x384 steady", round(time.time()-t0,2), flush=True)
