import time, numpy as np, jax
from macvo_tpu.utils import timer
import bench
from macvo_tpu.data.datasets.synthetic import SyntheticStereo

timer.setup(True)
seq = SyntheticStereo({"n_frames": 4, "width": 640, "height": 480, "fx": 320.0, "fy": 320.0, "cx": 320.0, "cy": 240.0})
from macvo_tpu.data.frame import to_device
frames = [to_device(seq[i]) for i in range(4)]
odom = bench.build_odometry(640, 480)
odom.run(frames[0])
for i in range(3):
    odom.run(frames[1 + i % 3])
timer.reset()
t0 = time.perf_counter()
for i in range(6):
    odom.run(frames[1 + i % 3])
odom.Optimizer.write_map(odom.graph)
el = time.perf_counter() - t0
print(f"{6/el:.2f} fps")
timer.report()
