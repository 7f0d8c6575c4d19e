"""Regenerate docs/demo_rollout.gif: the autopilot driving a rich multi-lane
town — banded facades with procedural window grids, asphalt speckle, blob
shadows, lane markings + zebra crosswalks, crosswalk walkers AND sidewalk
strollers, junction turn fans (the expert genuinely picks turns), light fog —
RGB camera on the left, semantic camera on the right, both from the
exact-parity rasterizer.

Run on any platform (TPU default; slow-but-fine on CPU):
    python docs/make_demo_gif.py
"""

from __future__ import annotations

import numpy as np
from PIL import Image

import jax

from carla_imitation_learning_tpu.render.pipeline import RenderConfig, make_renderer
from carla_imitation_learning_tpu.sim import SimParams, make_town
from carla_imitation_learning_tpu.sim.world import (
    autopilot_control, reset_env, step_env,
)

N_FRAMES = 160
OUT = "docs/demo_rollout.gif"


def main() -> None:
    town = make_town(blocks=3, n_buildings=24, n_lights=8, corner_radius=6.0,
                     lanes_per_direction=2, superblocks=True, turn_fans=True,
                     seed=3)
    params = SimParams(n_agents=15, n_pedestrians=12, ped_sidewalk_frac=0.4,
                       lane_change_period=120, turn_period=80,
                       agent_turn_prob=0.01)
    rcfg = RenderConfig(height=128, width=128, backend="pallas", rgb=True,
                        max_triangles=2048, facade_bands=3, shadows=True,
                        markings=True, fog_density=0.008, texture_detail=True)
    render = jax.jit(make_renderer(params, town, rcfg))
    step = jax.jit(lambda s: step_env(params, town, s,
                                      autopilot_control(params, town, s))[0])

    # roll longer than needed, then keep the N_FRAMES window in which the ego
    # covers the most ground (skips red-light waits — a stopped ego makes a
    # frozen gif)
    state = reset_env(params, town, jax.random.PRNGKey(2))
    all_frames, pos = [], []
    for i in range(3 * N_FRAMES):
        out = render(state)
        rgb = (np.asarray(out["rgb"]).clip(0, 1) * 255).astype(np.uint8)
        sem = (np.asarray(out["semantic_rgb"]).clip(0, 1) * 255).astype(np.uint8)
        all_frames.append(np.concatenate([rgb, sem], axis=1))
        pos.append(np.asarray(state.ego_pos))
        state = step(state)
    dist = np.linalg.norm(np.diff(np.asarray(pos), axis=0), axis=-1)
    windows = np.convolve(dist, np.ones(N_FRAMES - 1), mode="valid")
    start = int(windows.argmax())
    frames = all_frames[start:start + N_FRAMES]
    imgs = [Image.fromarray(f).resize((512, 256), Image.NEAREST) for f in frames]
    imgs[0].save(OUT, save_all=True, append_images=imgs[1:], duration=100,
                 loop=0)
    print(f"{OUT}: {len(imgs)} frames")


if __name__ == "__main__":
    main()
