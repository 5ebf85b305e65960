import time, numpy as np, jax, jax.numpy as jnp, cv2
from video_segment_tpu.core import oversegmentation as ov
cap = cv2.VideoCapture('/root/reference/video_example/test_video.MOV')
frames=[cap.read()[1] for _ in range(21)]
vol = jnp.asarray(np.stack(frames).astype(np.float32)/255.0)
flow = jnp.zeros((20,480,272,2), jnp.float32)
p1 = ov.OversegParams(min_region_size=100, max_rounds_per_level=1, max_final_rounds=1, min_size_rounds=1)
p8 = ov.OversegParams(min_region_size=100, max_rounds_per_level=3, max_final_rounds=3, min_size_rounds=3)
for tag, fl in [("noflow", None), ("flow", flow)]:
    for ptag, p in [("r1", p1), ("r3", p8)]:
        r = ov.oversegment(vol, flow=fl, params=p); np.asarray(r.label)
        t0=time.time(); r = ov.oversegment(vol, flow=fl, params=p); np.asarray(r.label)
        print(tag, ptag, round(time.time()-t0,2), flush=True)
