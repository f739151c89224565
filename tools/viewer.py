#!/usr/bin/env python
"""Interactive browser viewer — the headless, dependency-free replacement for
the reference's PyQt5/OpenGL vis tool (``tools/vis_tools/active_window.py``
+ ``functions/{lidargen_sampler,layout_sampler,lidm_cond_sample}.py``).

A stdlib HTTP server drives the registry samplers in-process and renders the
results client-side on HTML canvases (range-image colormap + BEV scatter) —
no GUI toolkit, display, or external JS needed, so it works over SSH against
a TPU host.  Layout-conditioned configs accept interactively edited boxes
([[x, y, z, l, w, h, yaw, class], ...]) which are rasterized on-device into
the concat-condition mask (``ops/projection.py::convert_boxes_to_2d``) — the
miniature of the reference GUI's layout-editing workflow.

Usage:
  python tools/viewer.py [--port 8400] [--ckpt-root DIR] [--resolution H W]

``--ckpt-root DIR`` restores ``DIR/<config>`` (orbax) per config; without it
samplers run from random init (structure smoke, like the generate CLIs).
"""

import argparse
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

UNCOND = ("nuscenes-unet-uncond",)
FLOW = ("meanflow-nusc",)
COND = ("nuscenes-box-layout-v6", "nuscenes-auto-reg-v2")
CONFIGS = UNCOND + FLOW + COND


class SamplerHub:
    """Builds and caches (engine, params, lidar_utils) per config name."""

    def __init__(self, ckpt_root=None, resolution=None):
        self.ckpt_root = ckpt_root
        self.resolution = resolution
        self._cache = {}
        # per-config build locks: a minutes-long first compile of one config
        # must not block requests for configs that are already cached
        self._lock = threading.Lock()
        self._build_locks = {}

    # ------------------------------------------------------------ builders
    def _restore(self, name, init_params):
        import jax  # noqa: F401  (defer jax import to first use)

        from lidarcrafter_tpu.training import TrainState, make_optimizer
        from lidarcrafter_tpu.training.checkpoint import restore_checkpoint

        if not self.ckpt_root:
            return init_params, False
        ckpt = Path(self.ckpt_root) / name
        if not ckpt.exists():
            return init_params, False
        template = TrainState.create(init_params, make_optimizer())
        state, _ = restore_checkpoint(str(ckpt), template)
        return state.ema_params, True

    def _build(self, name):
        import jax
        import jax.numpy as jnp

        from lidarcrafter_tpu.configs import get_config
        from lidarcrafter_tpu.training import build_diffusion_training

        cfg = get_config(name)
        if self.resolution:
            cfg.data.resolution = tuple(self.resolution)
            if getattr(cfg, "condition_model", None) is not None:
                cfg.condition_model.params["feature_map_size"] = tuple(
                    self.resolution
                )
        H, W = cfg.data.resolution

        if name in FLOW:
            from lidarcrafter_tpu.training.factory import build_flow_training

            model, engine, lidar_utils = build_flow_training(cfg)
            params = model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, H, W, 2)),
                jnp.zeros((1,)), jnp.zeros((1,)),
            )
            params, restored = self._restore(name, params)
            return dict(cfg=cfg, engine=engine, params=params,
                        lidar_utils=lidar_utils, kind="flow",
                        restored=restored)

        if name in COND:
            models, engine, lidar_utils = build_diffusion_training(cfg)
            model, cond_model = models["model"], models["cond"]
            L = cfg.condition_model.params["layout_length"]
            cc = cfg.condition_model.params.get("out_channels", 0)
            batch = self._cond_batch(cfg, jnp, 1, L, cc, boxes=None,
                                     lidar_utils=lidar_utils)
            cond_params = cond_model.init(jax.random.PRNGKey(1), batch)
            layout = cond_model.apply(cond_params, batch)
            cd = {"time_condition": jnp.zeros((1,)), "other_condition": layout}
            model_params = model.init(
                jax.random.PRNGKey(2), jnp.zeros((1, H, W, 2)), cd
            )
            params = {"model": model_params, "cond": cond_params}
            params, restored = self._restore(name, params)
            return dict(cfg=cfg, engine=engine, params=params,
                        lidar_utils=lidar_utils, kind="cond", L=L, cc=cc,
                        restored=restored)

        model, engine, lidar_utils = build_diffusion_training(cfg)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, H, W, 2)), jnp.zeros((1,))
        )
        params, restored = self._restore(name, params)
        return dict(cfg=cfg, engine=engine, params=params,
                    lidar_utils=lidar_utils, kind="uncond", restored=restored)

    @staticmethod
    def _cond_batch(cfg, jnp, B, L, cc, boxes, lidar_utils):
        """Synthetic condition batch; ``boxes`` ((N,8) list or None) is
        rasterized into the concat mask like the dataset does."""
        H, W = cfg.data.resolution
        batch = {
            "scaled_gt_boxes": jnp.zeros((B, L, 9)),
            "gt_boxes_2d": jnp.zeros((B, L, 4)),
            "is_valid_obj": jnp.ones((B, L)),
        }
        autoreg = cfg.data.task == "autoregressive_generation"
        if cc:
            import numpy as np

            from lidarcrafter_tpu.ops.projection import convert_boxes_to_2d
            from lidarcrafter_tpu.training.preprocess import (
                preprocess_condition_mask,
            )

            ncls = len(cfg.data.class_names)
            if boxes:
                arr = np.zeros((L, 8), np.float32)
                n = min(len(boxes), L)
                arr[:n] = np.asarray(boxes, np.float32)[:n, :8]
                mask = np.arange(L) < n
                _, cmask, _ = convert_boxes_to_2d(
                    jnp.asarray(arr), jnp.asarray(mask), H=H, W=W
                )
            else:
                cmask = jnp.zeros((H, W, 2))
            concat = preprocess_condition_mask(
                {"condition_mask": cmask[None]}, lidar_utils, ncls
            )
            batch["concat_cond"] = (
                concat if not autoreg else concat[..., : cc - 1]
            )
            if autoreg:
                batch["autoregressive_cond"] = jnp.zeros((B, H, W, 1))
        return batch

    # -------------------------------------------------------------- public
    def get(self, name):
        with self._lock:
            if name in self._cache:
                return self._cache[name]
            build_lock = self._build_locks.setdefault(name, threading.Lock())
        with build_lock:
            with self._lock:
                if name in self._cache:
                    return self._cache[name]
            entry = self._build(name)
            with self._lock:
                self._cache[name] = entry
            return entry

    def sample(self, name, num_steps=8, mode="ddim", seed=0, boxes=None):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from lidarcrafter_tpu.training.preprocess import postprocess_sample

        entry = self.get(name)
        engine, params = entry["engine"], entry["params"]
        rng = jax.random.PRNGKey(int(seed))
        if entry["kind"] == "flow":
            sample = engine.sample(params, rng, batch_size=1)
        elif entry["kind"] == "cond":
            batch = self._cond_batch(
                entry["cfg"], jnp, 1, entry["L"], entry["cc"], boxes,
                lidar_utils=entry["lidar_utils"],
            )
            sample = engine.sample(
                params, rng, batch, batch_size=1, num_steps=int(num_steps),
                mode=mode,
            )
        else:
            sample = engine.sample(
                params, rng, batch_size=1, num_steps=int(num_steps), mode=mode
            )
        post = postprocess_sample(sample, entry["lidar_utils"])
        depth = np.asarray(post["depth"][0, ..., 0])
        refl = np.asarray(post["reflectance"][0, ..., 0])
        xyz = np.asarray(post["xyz"][0]).reshape(-1, 3)
        keep = np.linalg.norm(xyz, axis=1) > 1e-2
        xyz = xyz[keep][:16384]
        return {
            "depth": np.round(depth, 3).tolist(),
            "reflectance": np.round(refl, 3).tolist(),
            "points": np.round(xyz, 2).tolist(),
            "restored_checkpoint": bool(entry["restored"]),
        }


_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>lidarcrafter-tpu viewer</title>
<style>
 body{font-family:system-ui,sans-serif;margin:1.2rem;background:#14161a;color:#e6e6e6}
 canvas{background:#000;display:block;margin:.4rem 0;border:1px solid #333}
 select,input,button,textarea{background:#22252b;color:#e6e6e6;border:1px solid #444;
   padding:.3rem .5rem;margin-right:.5rem}
 button{cursor:pointer} #status{color:#8fb6ff} .row{margin:.5rem 0}
 textarea{width:46rem;height:4rem;vertical-align:top}
</style></head><body>
<h2>lidarcrafter-tpu viewer</h2>
<div class="row">
 <select id="config">__OPTIONS__</select>
 steps <input id="steps" type="number" value="8" min="1" style="width:4rem">
 <select id="mode"><option>ddim</option><option>ddpm</option></select>
 seed <input id="seed" type="number" value="0" style="width:4rem">
 <button id="go">Generate</button> <span id="status"></span>
</div>
<div class="row">layout boxes (conditional configs) [[x,y,z,l,w,h,yaw,class],…]:<br>
 <textarea id="boxes">[[10,3,-0.5,4.5,2,1.7,0.3,1],[18,-6,-0.4,4.2,1.9,1.6,-1.2,1]]</textarea>
</div>
<div>range depth <canvas id="depth"></canvas></div>
<div>reflectance <canvas id="refl"></canvas></div>
<div>BEV (&plusmn;50 m) <canvas id="bev" width="560" height="560"></canvas></div>
<script>
function turbo(t){t=Math.max(0,Math.min(1,t));
 return [Math.round(255*Math.min(1,Math.max(0,34.61+t*(1172.33-t*(10793.56-t*(33300.12-t*(38394.49-t*14825.05))))/255))),
         Math.round(255*Math.min(1,Math.max(0,23.31+t*(557.33+t*(1225.33-t*(3574.96-t*(1073.77+t*707.56))))/255))),
         Math.round(255*Math.min(1,Math.max(0,27.2+t*(3211.1-t*(15327.97-t*(27814-t*(22569.18-t*6838.66))))/255)))];}
function drawImg(id, rows, maxv){const H=rows.length,W=rows[0].length;
 const c=document.getElementById(id);c.width=W;c.height=H;
 c.style.width='100%';c.style.imageRendering='pixelated';
 const g=c.getContext('2d'),im=g.createImageData(W,H);
 for(let i=0;i<H;i++)for(let j=0;j<W;j++){const v=rows[i][j]/maxv;
  const [r,gg,b]=turbo(v);const o=4*(i*W+j);
  im.data[o]=r;im.data[o+1]=gg;im.data[o+2]=b;im.data[o+3]=255;}
 g.putImageData(im,0,0);}
function drawBEV(pts){const c=document.getElementById('bev'),g=c.getContext('2d');
 g.fillStyle='#000';g.fillRect(0,0,c.width,c.height);
 const s=c.width/100.0;
 for(const p of pts){const x=c.width/2+p[0]*s,y=c.height/2-p[1]*s;
  if(x<0||y<0||x>=c.width||y>=c.height)continue;
  const t=Math.max(0,Math.min(1,(p[2]+3)/6));const [r,gg,b]=turbo(t);
  g.fillStyle=`rgb(${r},${gg},${b})`;g.fillRect(x,y,1.6,1.6);}}
document.getElementById('go').onclick=async()=>{
 const st=document.getElementById('status');st.textContent='sampling…';
 let boxes=null;
 try{boxes=JSON.parse(document.getElementById('boxes').value);}catch(e){boxes=null;}
 const body={config:document.getElementById('config').value,
  steps:+document.getElementById('steps').value,
  mode:document.getElementById('mode').value,
  seed:+document.getElementById('seed').value, boxes:boxes};
 try{
  const r=await fetch('/api/sample',{method:'POST',body:JSON.stringify(body)});
  if(!r.ok){st.textContent='error: '+await r.text();return;}
  const d=await r.json();
  drawImg('depth',d.depth,80.0);drawImg('refl',d.reflectance,1.0);
  drawBEV(d.points);
  st.textContent=(d.restored_checkpoint?'checkpoint weights':'random init')+
   ' · '+d.points.length+' points';
 }catch(e){st.textContent='error: '+e;}
};
</script></body></html>"""


def make_handler(hub):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body, ctype="application/json"):
            data = body if isinstance(body, bytes) else body.encode()
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path in ("/", "/index.html"):
                opts = "".join(f"<option>{c}</option>" for c in CONFIGS)
                self._send(200, _PAGE.replace("__OPTIONS__", opts),
                           "text/html; charset=utf-8")
            else:
                self._send(404, "not found", "text/plain")

        def do_POST(self):
            if self.path != "/api/sample":
                self._send(404, "not found", "text/plain")
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n) or b"{}")
                name = req.get("config", CONFIGS[0])
                if name not in CONFIGS:
                    raise ValueError(f"unknown config {name!r}")
                out = hub.sample(
                    name,
                    num_steps=req.get("steps", 8),
                    mode=req.get("mode", "ddim"),
                    seed=req.get("seed", 0),
                    boxes=req.get("boxes"),
                )
                self._send(200, json.dumps(out))
            except Exception as e:  # surface the reason to the page
                self._send(500, f"{type(e).__name__}: {e}", "text/plain")

    return Handler


def serve(port=8400, host="127.0.0.1", ckpt_root=None, resolution=None):
    hub = SamplerHub(ckpt_root=ckpt_root, resolution=resolution)
    httpd = ThreadingHTTPServer((host, port), make_handler(hub))
    return httpd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8400)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--ckpt-root", default=None)
    ap.add_argument("--resolution", type=int, nargs=2, default=None,
                    help="override H W (smoke runs)")
    args = ap.parse_args()

    import os as _os

    import jax

    if _os.environ.get("LCT_PLATFORM"):
        jax.config.update("jax_platforms", _os.environ["LCT_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir",
                      _os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    httpd = serve(args.port, args.host, args.ckpt_root, args.resolution)
    print(f"viewer on http://{args.host}:{args.port}  (configs: {', '.join(CONFIGS)})")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
