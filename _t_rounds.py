import time, numpy as np, jax, jax.numpy as jnp, cv2
from video_segment_tpu.core import oversegmentation as ov
cap = cv2.VideoCapture('/root/reference/video_example/test_video.MOV')
frames=[cap.read()[1] for _ in range(21)]
vol = jnp.asarray(np.stack(frames).astype(np.float32)/255.0)
for tag, p in [
    ("tiny", ov.OversegParams(min_region_size=100, max_rounds_per_level=1, max_final_rounds=1, min_size_rounds=1)),
    ("small", ov.OversegParams(min_region_size=100, max_rounds_per_level=3, max_final_rounds=4, min_size_rounds=4)),
    ("default", ov.OversegParams(min_region_size=100)),
]:
    r = ov.oversegment(vol, params=p); np.asarray(r.label)  # compile
    t0=time.time(); r = ov.oversegment(vol, params=p); lab=np.asarray(r.label)
    print(tag, round(time.time()-t0,2), "s, regions", len(np.unique(lab)), flush=True)
