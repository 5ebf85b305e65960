import cProfile, pstats, io, os
os.environ["BENCH_FRAMES"]="45"
import bench
from video_segment_tpu.dataio import video
reader = video.VideoReader(bench.VIDEO, trim_to=45)
frames = list(reader); reader.close()
w, h = reader.info.width, reader.info.height
bench.run_pipeline(frames, w, h, False)  # warmup/compile
pr = cProfile.Profile()
pr.enable()
bench.run_pipeline(frames, w, h, False)
pr.disable()
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(28)
print("\n".join(l for l in s.getvalue().splitlines() if "video_segment_tpu" in l or "cumtime" in l or "jax" in l.lower())[:4000])
