"""The executable walkthrough (tutorials/basic.py) must run end-to-end on
CPU and produce its artifacts — it doubles as the API smoke test the
reference's notebooks provide (economic_simulation_basic.ipynb)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_tutorial_runs_end_to_end(tmp_path):
    env = dict(os.environ)
    env["TUTORIAL_ITERS"] = "3"  # full default is 200; 3 keeps CI fast
    env["TUTORIAL_FORCE_CPU"] = "1"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tutorials", "basic.py"),
         str(tmp_path)],
        env=env, capture_output=True, text=True, timeout=560,
    )
    assert out.returncode == 0, out.stdout + "\n" + out.stderr
    for artifact in ("world.png", "episode_log.lz4", "training_curve.png",
                     "replay.lz4", "breakdown_1.png"):
        assert (tmp_path / artifact).exists(), artifact
    assert "replay round-trip bit-identical" in out.stdout
    assert "Done." in out.stdout
