import time, numpy as np, jax
import bench
from macvo_tpu.data.datasets.synthetic import SyntheticStereo
from macvo_tpu.data.frame import to_device

t_start = time.time()
seq = SyntheticStereo({"n_frames": 4, "width": 640, "height": 480, "fx": 320.0, "fy": 320.0, "cx": 320.0, "cy": 240.0})
frames = [to_device(seq[i]) for i in range(4)]
odom = bench.build_odometry(640, 480)
odom.run(frames[0])
for i in range(3):
    odom.run(frames[1 + i % 3])
print(f"warmup+compile took {time.time()-t_start:.0f}s")

# instrument one frame manually
import jax.numpy as jnp
frame0, frame1 = odom.prev_keyframe[0], frames[(odom._frame_count) % 3 + 1]
t0 = time.perf_counter()
depth1, match01 = odom.Frontend.estimate_pair(frame0.stereo, frame1.stereo)
t1 = time.perf_counter()
jax.block_until_ready((depth1.depth, match01.flow))
t2 = time.perf_counter()
print(f"frontend dispatch {1000*(t1-t0):.1f}ms wait {1000*(t2-t1):.1f}ms")

pending = odom.Optimizer.take_pending()
prev_pose_dev = jnp.asarray(pending.pose, jnp.float32) if pending else jnp.asarray(odom.graph.frames.data['pose'][odom.prev_keyframe[1]])
odom.MotionEstimator.update(prev_pose_dev)
est = jnp.asarray(odom.MotionEstimator.predict(frame1, match01.flow, depth1.depth), jnp.float32).reshape(7)
key = jax.random.fold_in(odom._rng_key, 999)
shape_key = (480, 640)
t3 = time.perf_counter()
packed_dev = odom._pipeline_cache[shape_key](frame0.stereo.imageL, odom.prev_keyframe[2], depth1, match01, prev_pose_dev, est, key)
t4 = time.perf_counter()
jax.block_until_ready(packed_dev)
t5 = time.perf_counter()
packed = np.asarray(packed_dev)
t6 = time.perf_counter()
print(f"kp dispatch {1000*(t4-t3):.1f}ms  device-wait {1000*(t5-t4):.1f}ms  download {1000*(t6-t5):.1f}ms")
