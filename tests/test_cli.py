"""CLI runner (the launch-file analog)."""

import numpy as np
import pytest

from mrs_optic_flow_tpu import native
from mrs_optic_flow_tpu.__main__ import main


def test_cli_synthetic(capsys):
    rc = main(["--synthetic", "--frames", "5", "--velocity", "0.5,0.0", "--quiet"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "fcu_untilted" in out and "health" in out


def test_cli_flight_gate(capsys):
    """``--flight``: the closed-loop flight simulator as a CLI regression
    gate — FlightReport JSON on stdout, exit code by budgets.  Both
    profiles are driven: banked against the default budgets, and LEVEL
    with an impossible budget — one run covers the level branch AND the
    gate flip, while its report proves the level flight would pass the
    defaults (no second banked render on the fast lane)."""
    import json

    rc = main(["--flight", "banked", "--quiet"])
    out = capsys.readouterr().out.strip().splitlines()
    rep = json.loads(out[-1])
    assert rc == 0, rep
    assert rep["rmse_xy"] < 0.15
    assert rep["nan_published"] == 0
    assert set(rep["per_phase_coverage"]) == {
        "climb", "cruise", "brake", "descent"}
    assert 0.005 < rep["nees_xy"] < 2.5

    rc_level = main(["--flight", "level", "--quiet",
                     "--flight-rmse-budget", "0.001"])
    out = capsys.readouterr().out.strip().splitlines()
    rep_level = json.loads(out[-1])
    assert rc_level == 1  # the gate actually gates
    # ...but the level flight itself is healthy against the DEFAULT gates
    assert rep_level["rmse_xy"] < 0.15, rep_level
    assert rep_level["nan_published"] == 0
    assert 0.005 < rep_level["nees_xy"] < 2.5
    assert all(v >= 0.9 for v in rep_level["per_phase_coverage"].values())
    assert set(rep_level["per_phase_coverage"]) == {
        "takeoff", "cruise", "descent"}


def test_cli_overrides(capsys):
    rc = main([
        "--synthetic", "--frames", "4", "--quiet",
        "--set", "mrs_optic_flow.shifted_pts_thr=4",
        "--set", "constraints.max_pixel_speed=60",
    ])
    assert rc == 0


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
@pytest.mark.slow
def test_cli_record_and_replay(tmp_path, capsys):
    rec = str(tmp_path / "run.ofrec")
    rc = main(["--synthetic", "--frames", "5", "--velocity", "0.6,0.2",
               "--record", rec, "--quiet"])
    assert rc == 0
    rc = main(["--replay", rec, "--quiet"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "twists from 5 replay frames" in out


@pytest.mark.slow
def test_cli_fleet(capsys):
    # default 480/120 geometry: a 96-px crop gives the homography
    # decomposition a ~13-degree FOV and the velocity estimate falls apart
    rc = main(["--fleet", "2", "--frames", "4", "--velocity", "0.5,-0.2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "2/2 streams ok" in out
    # fleet mean velocity within 10% of truth on the last full tick
    import re

    m = re.findall(r"fleet mean v = ([+-]\d+\.\d+) ([+-]\d+\.\d+)", out)
    vx, vy = float(m[-1][0]), float(m[-1][1])
    assert abs(vx - 0.5 * 1.0) < 0.1 and abs(vy + 0.2) < 0.1, (vx, vy)


def test_cli_ros_wiring(monkeypatch):
    """--ros: init_node, bridge construction with the frame args, warmup,
    spin — the roslaunch deployment path (launch/optic_flow_tpu.launch)
    without a ROS installation."""
    import sys
    import types as _types

    calls = {}
    fake_rospy = _types.SimpleNamespace(
        init_node=lambda name: calls.setdefault("node", name),
        loginfo=lambda *a: None,
    )
    monkeypatch.setitem(sys.modules, "rospy", fake_rospy)

    class FakeBridge:
        def __init__(self, cfg, *, camera_frame, uav_frame, uav_untilted_frame):
            calls["frames"] = (camera_frame, uav_frame, uav_untilted_frame)
            calls["cfg_frame_size"] = cfg.frame_size

        def warmup(self):
            calls["warmup"] = True

        def spin(self):
            calls["spin"] = True

    import mrs_optic_flow_tpu.runtime.ros_bridge as rb

    monkeypatch.setattr(rb, "RosBridge", FakeBridge)
    rc = main(["--ros", "--camera-frame", "uav7/cam",
               "--uav-frame", "uav7/fcu"])
    assert rc == 0
    assert calls == {
        "node": "optic_flow",
        "frames": ("uav7/cam", "uav7/fcu", "fcu_untilted"),
        "cfg_frame_size": 480,
        "warmup": True,
        "spin": True,
    }

    # --no-warmup skips the pre-stream compile
    calls.clear()
    rc = main(["--ros", "--no-warmup"])
    assert rc == 0 and "warmup" not in calls and calls["spin"]
