import time, numpy as np, jax, jax.numpy as jnp, cv2
from video_segment_tpu.core import oversegmentation as ov
# Real video frames (noise is worst-case; use actual content)
cap = cv2.VideoCapture('/root/reference/video_example/test_video.MOV')
frames=[]
for _ in range(21):
    ok, f = cap.read(); frames.append(f)
vol = jnp.asarray(np.stack(frames).astype(np.float32)/255.0)
params = ov.OversegParams(min_region_size=100)
t0=time.time(); res = ov.oversegment(vol, params=params); lab=np.asarray(res.label)
print("compile+first", round(time.time()-t0,1), "regions", len(np.unique(lab)), flush=True)
for _ in range(2):
    t0=time.time(); res = ov.oversegment(vol, params=params); np.asarray(res.label)
    print("steady", round(time.time()-t0,2), flush=True)
