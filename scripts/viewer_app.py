"""Interactive viewer: human control of a live env in the browser.

The reference `viewer_app` (src/apps/viewer_app.cpp:18-162, viewer.cpp:24-303)
opens an SDL2 window, steps ONE env with keyboard agent control, supports
agent switching and an overview fly-cam. This container is headless, so the
TPU-native equivalent serves the same loop over HTTP: a canvas page polls
`/step` at the simulation rate with the currently-held keys; the server
converts keys to the reference action bitmask, steps the env (auto-reset on
done, viewer_app.cpp:56-66), renders either the active agent's hires view or
a free overview camera (viewer.cpp:153-303 fly-cam), and returns a PNG.

Controls (matching viewer.cpp key map where it makes sense in a browser):
  W/S          forward / backward
  A/D          strafe left / right
  Left/Right   look left / right
  Up/Down      look up / down
  Space        jump
  E            interact
  1..9 / Tab   switch active agent
  O            toggle overview fly-cam  (WASD+QZ move, IJKL look)

Usage:
  python scripts/viewer_app.py --env TowerBuilding --num_agents 2 --port 8831
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/megaverse_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


PAGE = """<!doctype html>
<html><head><title>megaverse_tpu viewer</title><style>
 body { background:#111; color:#ddd; font-family:monospace; text-align:center }
 canvas { image-rendering: pixelated; border:1px solid #444; margin-top:12px }
 #hud { margin-top:8px; white-space:pre }
</style></head><body>
<h3>megaverse_tpu — %SCENARIO%</h3>
<canvas id="cv" width="%W%" height="%H%" style="width:%DW%px;height:%DH%px"></canvas>
<div id="hud">connecting…</div>
<script>
const keys = new Set();
window.addEventListener('keydown', e => { keys.add(e.code); e.preventDefault(); });
window.addEventListener('keyup',   e => { keys.delete(e.code); });
const cv = document.getElementById('cv'), ctx = cv.getContext('2d');
const hud = document.getElementById('hud');
let busy = false;
async function tick() {
  if (busy) return; busy = true;
  try {
    const r = await fetch('/step', {method:'POST',
      body: JSON.stringify({keys:[...keys]})});
    const j = await r.json();
    const img = new Image();
    img.onload = () => ctx.drawImage(img, 0, 0);
    img.src = 'data:image/png;base64,' + j.frame;
    hud.textContent = `agent ${j.agent}  reward ${j.reward.toFixed(3)}  ` +
      `total ${j.total_reward.toFixed(2)}  frame ${j.frame_no}` +
      (j.overview ? '  [overview]' : '') + (j.done ? '  EPISODE DONE' : '');
    for (const code of j.consumed) keys.delete(code);
  } finally { busy = false; }
}
setInterval(tick, 1000/15);
</script></body></html>
"""


class ViewerState:
    """One env + camera/agent-switch state behind a lock."""

    def __init__(self, scenario: str, num_agents: int, seed: int,
                 hires: int, params=None):
        import jax

        from megaverse_tpu.utils.cache import enable_compile_cache

        enable_compile_cache()
        if os.environ.get("MEGAVERSE_VIEWER_CPU"):
            jax.config.update("jax_platforms", "cpu")

        from megaverse_tpu.vector_env import VectorEnv

        self.env = VectorEnv(scenario, num_envs=1,
                             num_agents_per_env=num_agents, seed=seed,
                             params=params, obs_format="rgb")
        self.scenario = scenario
        self.num_agents = num_agents
        self.hires = hires
        self.active_agent = 0
        self.overview = False
        self.total_reward = 0.0
        self.frame_no = 0
        self.lock = threading.Lock()
        self.env.reset()

        from megaverse_tpu.env import render_custom_camera

        self._render = jax.jit(
            lambda s, eye, yaw, pitch: render_custom_camera(
                self.env.scenario, s, eye, yaw, pitch,
                width=hires * 128, height=hires * 72))
        # overview fly-cam state (viewer.cpp:153-303)
        pos = np.asarray(self.env.state.agents.pos)[0, 0]
        self.cam_eye = [float(pos[0]) - 4.0, float(pos[1]) + 6.0, float(pos[2]) + 6.0]
        self.cam_yaw = -0.6
        self.cam_pitch = -0.6

    # -- key decoding -------------------------------------------------------
    def _bitmask(self, keys) -> int:
        import megaverse_tpu.constants as C

        k = set(keys)
        m = 0
        if "KeyW" in k: m |= C.ACTION_FORWARD
        if "KeyS" in k: m |= C.ACTION_BACKWARD
        if "KeyA" in k: m |= C.ACTION_LEFT
        if "KeyD" in k: m |= C.ACTION_RIGHT
        if "ArrowLeft" in k: m |= C.ACTION_LOOK_LEFT
        if "ArrowRight" in k: m |= C.ACTION_LOOK_RIGHT
        if "ArrowUp" in k: m |= C.ACTION_LOOK_UP
        if "ArrowDown" in k: m |= C.ACTION_LOOK_DOWN
        if "Space" in k: m |= C.ACTION_JUMP
        if "KeyE" in k: m |= C.ACTION_INTERACT
        return m

    def _fly_cam(self, keys):
        k = set(keys)
        speed, look = 0.35, 0.06
        import math

        cy, sy = math.cos(self.cam_yaw), math.sin(self.cam_yaw)
        fwd = (sy * -1.0, 0.0, cy * -1.0)  # same convention as agent forward
        right = (cy, 0.0, -sy)
        d = [0.0, 0.0, 0.0]
        if "KeyW" in k: d = [d[i] + fwd[i] for i in range(3)]
        if "KeyS" in k: d = [d[i] - fwd[i] for i in range(3)]
        if "KeyD" in k: d = [d[i] + right[i] for i in range(3)]
        if "KeyA" in k: d = [d[i] - right[i] for i in range(3)]
        if "KeyQ" in k: d[1] += 1.0
        if "KeyZ" in k: d[1] -= 1.0
        self.cam_eye = [self.cam_eye[i] + speed * d[i] for i in range(3)]
        if "KeyJ" in k: self.cam_yaw += look
        if "KeyL" in k: self.cam_yaw -= look
        if "KeyI" in k: self.cam_pitch = min(1.5, self.cam_pitch + look)
        if "KeyK" in k: self.cam_pitch = max(-1.5, self.cam_pitch - look)

    # -- one viewer tick ----------------------------------------------------
    def step(self, keys):
        import jax
        import jax.numpy as jnp

        consumed = []
        with self.lock:
            for code in list(keys):
                if code == "KeyO":
                    self.overview = not self.overview
                    consumed.append(code)
                elif code == "Tab":
                    self.active_agent = (self.active_agent + 1) % self.num_agents
                    consumed.append(code)
                elif code.startswith("Digit"):
                    idx = int(code[5:]) - 1
                    if 0 <= idx < self.num_agents:
                        self.active_agent = idx
                    consumed.append(code)

            act = np.zeros((1, self.num_agents), np.int32)
            if not self.overview:
                act[0, self.active_agent] = self._bitmask(keys)
            else:
                self._fly_cam(keys)

            obs, rew, done, _ = self.env.step(act)
            self.frame_no += 1
            reward = float(np.asarray(rew)[0, self.active_agent])
            self.total_reward += reward
            is_done = bool(np.asarray(done)[0])
            if is_done:
                self.total_reward = 0.0

            state1 = jax.tree.map(lambda x: x[0], self.env.state)
            if self.overview:
                eye, yaw, pitch = self.cam_eye, self.cam_yaw, self.cam_pitch
            else:
                import megaverse_tpu.constants as C

                agents = np.asarray(self.env.state.agents.pos)
                cam_y = C.AGENT_BODY_OFFSET_Y + C.AGENT_CAMERA_OFFSET_Y
                eye = agents[0, self.active_agent] + np.asarray([0.0, cam_y, 0.0])
                yaw = float(np.asarray(self.env.state.agents.yaw)[0, self.active_agent])
                pitch = float(np.asarray(self.env.state.agents.pitch)[0, self.active_agent])
            img = np.asarray(self._render(
                state1, jnp.asarray(eye, jnp.float32),
                jnp.asarray(yaw, jnp.float32), jnp.asarray(pitch, jnp.float32)))

        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        return {
            "frame": base64.b64encode(buf.getvalue()).decode(),
            "agent": self.active_agent,
            "reward": reward,
            "total_reward": self.total_reward,
            "done": is_done,
            "frame_no": self.frame_no,
            "overview": self.overview,
            "consumed": consumed,
        }


def make_handler(state: ViewerState, hires: int):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path != "/":
                self.send_response(404)
                self.end_headers()
                return
            page = (PAGE.replace("%SCENARIO%", state.scenario)
                    .replace("%W%", str(hires * 128)).replace("%H%", str(hires * 72))
                    .replace("%DW%", str(4 * 128)).replace("%DH%", str(4 * 72)))
            body = page.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path != "/step":
                self.send_response(404)
                self.end_headers()
                return
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n) or b"{}")
            out = json.dumps(state.step(req.get("keys", []))).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

    return Handler


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--env", default="TowerBuilding")
    p.add_argument("--num_agents", type=int, default=1)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--port", type=int, default=8831)
    p.add_argument("--hires", type=int, default=2,
                   help="render scale (x128 x72)")
    args = p.parse_args(argv)

    state = ViewerState(args.env, args.num_agents, args.seed, args.hires)
    srv = ThreadingHTTPServer(("127.0.0.1", args.port),
                              make_handler(state, args.hires))
    print(f"viewer: http://127.0.0.1:{args.port}/  (scenario={args.env})",
          flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    main()
