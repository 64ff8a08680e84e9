#!/usr/bin/env python
"""On-chip validation: chunked SIFT pipeline on the textured fixture."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_bench")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from visualodometry_tpu.config import VOConfig
from visualodometry_tpu.data.synthetic import make_scene, render_textured_image
from visualodometry_tpu.core import init_state
from visualodometry_tpu.core.runner import make_chunked_pipeline_fn
from visualodometry_tpu.eval import ate_rmse

CHUNK=8; NF=CHUNK*4
cache="/root/repo/.bench_fixture_textured.npz"
if os.path.exists(cache):
    d=np.load(cache); u8=d["u8"]; gt=d["gt"]; K=d["K"]
else:
    rng=np.random.default_rng(7)
    scene=make_scene(rng,num_frames=NF,speed=1.2,turn_rate=0.002,image_size=(1226,370))
    imgs=np.stack([render_textured_image(scene,f) for f in range(NF)])
    u8=(np.clip(imgs,0,1)*255+0.5).astype(np.uint8); gt=scene.gt_positions; K=scene.K
    np.savez_compressed(cache,u8=u8,gt=gt,K=K)

backend = sys.argv[1] if len(sys.argv)>1 else "jnp"
cfg = VOConfig(extractor_type="sift", max_keypoints=4096, sift_n_features=4096,
    sift_contrast_threshold=0.02, sift_num_octaves=3, min_median_flow=3.0,
    max_reproj_err=2.0, pnp_reproj_err=2.0, min_depth=1.0, min_parallax_deg=0.35,
    lowe_ratio=0.8, essential_hypotheses=256, pnp_hypotheses=256,
    map_capacity=20480, matcher_backend=backend)
run = make_chunked_pipeline_fn(cfg, K)
state = init_state(cfg, desc_dim=128)
chunks=[jnp.asarray(u8[i*CHUNK:(i+1)*CHUNK]) for i in range(NF//CHUNK)]
_=float(jnp.sum(chunks[-1][:,::37,::37]))
t0=time.time(); state,out0=run(state,chunks[0]); _=float(jnp.sum(out0.T_wc))
print(f"compile+first {time.time()-t0:.0f}s", flush=True)
outs=[out0]; t0=time.time()
for c in chunks[1:]:
    state,out=run(state,c); outs.append(out)
_=float(jnp.sum(out.T_wc)); dt=time.time()-t0
fps=(len(chunks)-1)*CHUNK/dt
est=np.concatenate([np.asarray(o.T_wc)[:,:3,3] for o in outs])
resets=int(sum(np.asarray(o.did_reset).sum() for o in outs))
kfs=int(sum(np.asarray(o.is_keyframe).sum() for o in outs))
ate=float(ate_rmse(est[8:],gt[8:len(est)],align="sim3"))
print(f"RESULT backend={backend} fps={fps:.1f} resets={resets} kfs={kfs} ate={ate:.3f}")
