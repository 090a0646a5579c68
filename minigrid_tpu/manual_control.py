"""Interactive keyboard driver (reference: minigrid/manual_control.py:14-139).

Drives a single functional env with arrow keys in a pygame window.  The env
here is stateless, so the controller owns the ``EnvState`` and threads it
through ``step_env`` (no auto-reset: episode ends trigger an explicit
re-reset, like the reference).

Usage::

    python -m minigrid_tpu.manual_control --env-id MiniGrid-MultiRoom-N6-v0
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from minigrid_tpu.core.actions import Actions
from minigrid_tpu.registry import make, registered_ids

KEY_TO_ACTION = {
    "left": Actions.left,
    "right": Actions.right,
    "up": Actions.forward,
    "space": Actions.toggle,
    "pageup": Actions.pickup,
    "pagedown": Actions.drop,
    "tab": Actions.pickup,
    "left shift": Actions.drop,
    "enter": Actions.done,
}


class ManualControl:
    """Blocking pygame event loop mapping keys to actions."""

    def __init__(
        self,
        env,
        seed: int | None = None,
        tile_size: int = 32,
        screen_size: int = 640,
        agent_pov: bool = False,
    ):
        self.env = env
        self.seed = seed
        self.tile_size = tile_size
        self.screen_size = screen_size
        self.agent_pov = agent_pov
        self.closed = False
        self.state = None
        self.window = None
        self._reset_fn = jax.jit(env.reset)
        self._step_fn = jax.jit(env.step_env)
        self._frame_fn = jax.jit(
            lambda s: env.get_frame(s, tile_size=tile_size, agent_pov=agent_pov)
        )
        self._episode = 0

    # -- episode control -------------------------------------------------------
    def reset(self):
        seed = self.seed if self.seed is not None else np.random.randint(0, 2**31)
        key = jax.random.fold_in(jax.random.PRNGKey(seed), self._episode)
        if self.seed is None:
            self._episode += 1
        _, self.state = self._reset_fn(key)
        print("mission:", self.env.mission_text(self.state.mission))
        self.render()

    def step(self, action: Actions):
        self.state, reward = self._step_fn(self.state, int(action))
        print(
            f"step={int(self.state.step_count)}, reward={float(reward):.2f}"
        )
        if bool(self.state.terminated):
            print("terminated!")
            self.reset()
        elif bool(self.state.truncated):
            print("truncated!")
            self.reset()
        else:
            self.render()

    # -- pygame ------------------------------------------------------------------
    def render(self):
        import pygame

        frame = np.asarray(self._frame_fn(self.state))
        if self.window is None:
            pygame.init()
            pygame.display.init()
            self.window = pygame.display.set_mode(
                (self.screen_size, self.screen_size)
            )
            pygame.display.set_caption("minigrid-tpu")
        surf = pygame.surfarray.make_surface(frame.transpose(1, 0, 2))
        surf = pygame.transform.smoothscale(
            surf, (self.screen_size, self.screen_size)
        )
        self.window.blit(surf, (0, 0))
        pygame.display.flip()

    def close(self):
        import pygame

        self.closed = True
        if self.window is not None:
            pygame.display.quit()
            pygame.quit()
            self.window = None

    def start(self):
        import pygame

        self.reset()
        while not self.closed:
            for event in pygame.event.get():
                if event.type == pygame.QUIT:
                    self.close()
                    break
                if event.type == pygame.KEYDOWN:
                    event.key = pygame.key.name(int(event.key))
                    self.key_handler(event)

    def key_handler(self, event):
        key: str = event.key
        if key == "escape":
            self.close()
            return
        if key == "backspace":
            self.reset()
            return
        if key in KEY_TO_ACTION:
            self.step(KEY_TO_ACTION[key])
        else:
            print("pressed", key)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--env-id",
        default="MiniGrid-MultiRoom-N6-v0",
        choices=registered_ids(),
        metavar="ENV_ID",
    )
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--tile-size", type=int, default=32)
    parser.add_argument(
        "--agent-view",
        action="store_true",
        help="render the agent's partially observable view",
    )
    parser.add_argument("--agent-view-size", type=int, default=7)
    parser.add_argument("--screen-size", type=int, default=640)
    args = parser.parse_args(argv)

    env = make(args.env_id, agent_view_size=args.agent_view_size)
    ManualControl(
        env,
        seed=args.seed,
        tile_size=args.tile_size,
        screen_size=args.screen_size,
        agent_pov=args.agent_view,
    ).start()


if __name__ == "__main__":
    main()
