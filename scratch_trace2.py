import glob, numpy as np, jax, jax.numpy as jnp
from chessboard_vision_tpu import geometry as geo
from chessboard_vision_tpu.models.pipeline import VisionPipeline
from chessboard_vision_tpu.ops.static_resample import to_planar

rng = np.random.default_rng(0)
h, w = 1080, 1920
x0, y0, bs = 470, 50, 980
corners = np.array([[x0,y0],[x0+bs,y0],[x0,y0+bs],[x0+bs,y0+bs]])
g = geo.BoardGeometry.from_calibration(corners, display_size=(w,h))
pipe = VisionPipeline(g)
state = pipe.init_state()
frame = jnp.asarray(to_planar(rng.integers(0,256,(h,w,3),np.uint8)))
state = pipe.capture_reference(state, frame)
state, out = pipe.step(state, frame); jax.block_until_ready(out)

jax.profiler.start_trace("/tmp/jtrace2")
for _ in range(5):
    state, out = pipe.step(state, frame)
jax.block_until_ready(out)
jax.profiler.stop_trace()
print("done")
