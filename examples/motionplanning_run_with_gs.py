#!/usr/bin/env python
"""Motion-planning demo collection with GS rendering (CLI parity with
gsworld/mani_skill/examples/motionplanning/{franka,xarm6}/run_with_gs.py)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gsworld_tpu.rollout.run_with_gs import main

if __name__ == "__main__":
    main()
