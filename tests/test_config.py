import textwrap

from rebvo_tpu.config import (REBVOParameters, load_config, parse_config_text,
                              params_from_entries)


def test_parse_basic_format():
    text = textwrap.dedent("""
        // comment line
        &Detector
        Sigma0=2.5        // trailing comment
        ReferencePoints=9000
        &Camera
        FPS=30
        ZfX=100.5;
    """)
    entries = parse_config_text(text)
    assert entries[("Detector", "Sigma0")] == "2.5"
    assert entries[("Camera", "FPS")] == "30"
    assert entries[("Camera", "ZfX")] == "100.5"

    p = params_from_entries(entries)
    assert p.Sigma0 == 2.5
    assert p.ReferencePoints == 9000
    assert p.config_fps == 30
    assert p.ZfX == 100.5


def test_euroc_defaults_match_reference_config():
    p = REBVOParameters()
    assert p.Sigma0 == 1.7818
    assert p.SearchRange == 40
    assert p.TrackerIterNum == 5
    assert p.MaxPoints == 16000
    assert abs(p.zf_mean - (458.654 + 457.296) / 2) < 1e-9


def test_aliases(tmp_path):
    cfg = tmp_path / "cfg"
    cfg.write_text("&Camera\nFPS=25\nUseUndistort=0\n&IMU\nTimeScale=1e-6\n")
    p = load_config(str(cfg))
    assert p.config_fps == 25
    assert p.useUndistort == 0
    assert p.ImuTimeScale == 1e-6
    assert p.CamTimeScale == 1e-9  # untouched
