#!/usr/bin/env python
"""Random-action closed-loop rollout with GS rendering.

CLI parity with the reference examples/maniskill/gsworld_rand_action_
tabletop.py (env_id/cfg_name/num_envs/ep_len/sim/control freqs, FPS print).
Thin wrapper over gsworld_tpu.rollout.random_actions.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from gsworld_tpu.rollout.random_actions import main

if __name__ == "__main__":
    main()
