import cProfile, pstats, io
from video_segment_tpu.dataio import video
import bench
reader = video.VideoReader(bench.VIDEO, trim_to=45)
frames = list(reader); reader.close()
w, h = reader.info.width, reader.info.height
pr = cProfile.Profile()
pr.enable()
bench.run_pipeline(frames, w, h, True)
pr.disable()
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(30)
for l in s.getvalue().splitlines():
    if "video_segment_tpu" in l or "bench" in l or "_value" in l or "tvl1" in l:
        print(l)
