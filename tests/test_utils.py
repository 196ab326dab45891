"""Logger, timers, media, frozen-config utility tests."""

import csv
import time

import numpy as np
import pytest

from latent_diffusion_planning_tpu.utils.frozen import FrozenConfig
from latent_diffusion_planning_tpu.utils.logger import Logger
from latent_diffusion_planning_tpu.utils.media import (HTMLReport, save_image,
                                                       save_video,
                                                       to_uint8_hwc)
from latent_diffusion_planning_tpu.utils.timers import Every, Timer


def test_logger_csv_and_averaging(tmp_path):
    lg = Logger(tmp_path)
    lg.log("train/loss", 2.0)
    lg.log("train/loss", 4.0)
    lg.dump(10, "train")
    rows = list(csv.DictReader(open(tmp_path / "train.csv")))
    assert float(rows[-1]["loss"]) == 3.0  # averaged between dumps
    assert int(float(rows[-1]["step"])) == 10


def test_logger_stale_row_compaction(tmp_path):
    lg = Logger(tmp_path)
    for step in (10, 20, 30):
        lg.log("train/loss", step)
        lg.dump(step, "train")
    # restart at step 15: rows >= 15 dropped
    lg2 = Logger(tmp_path)
    lg2.log("train/loss", 1.0)
    lg2.dump(15, "train")
    steps = [int(float(r["step"]))
             for r in csv.DictReader(open(tmp_path / "train.csv"))]
    assert steps == [10, 15]


def test_logger_new_keys_extend_header(tmp_path):
    lg = Logger(tmp_path)
    lg.log("train/a", 1.0)
    lg.dump(1, "train")
    lg.log("train/a", 1.0)
    lg.log("train/b", 2.0)
    lg.dump(2, "train")
    rows = list(csv.DictReader(open(tmp_path / "train.csv")))
    assert "b" in rows[-1]


def test_logger_metrics_helper(tmp_path):
    lg = Logger(tmp_path)
    lg.log_metrics({"x": 1.0, "skip": "str"}, 5, "eval")
    lg.dump(5, "eval")
    rows = list(csv.DictReader(open(tmp_path / "eval.csv")))
    assert float(rows[-1]["x"]) == 1.0


def test_every():
    e = Every(5)
    assert e(0) and not e(3) and e(10)
    assert not Every(None)(0)


def test_timer_sections():
    t = Timer()
    with t.section("a"):
        time.sleep(0.01)
    avgs = t.averages()
    assert avgs["time/a"] >= 0.01


def test_to_uint8_hwc_ranges():
    assert to_uint8_hwc(np.zeros((4, 4, 3), np.uint8)).dtype == np.uint8
    out = to_uint8_hwc(np.full((4, 4, 3), -1.0))   # [-1,1] -> 0
    assert out.min() == 0
    out = to_uint8_hwc(np.full((4, 4, 3), 1.0))
    assert out.max() == 255
    chw = to_uint8_hwc(np.zeros((3, 8, 8)))        # CHW -> HWC
    assert chw.shape == (8, 8, 3)


def test_save_image_video_html(tmp_path):
    img = np.random.default_rng(0).integers(0, 255, (8, 8, 3), np.uint8)
    p = save_image(tmp_path / "x.png", img)
    assert p.exists()
    v = save_video(tmp_path / "v.gif", np.stack([img] * 3))
    assert v.exists()
    rep = HTMLReport("t")
    rep.add_header("h")
    rep.add_text("txt")
    rep.add_images([img, img], ["a", "b"])
    out = rep.save(tmp_path / "r.html")
    content = out.read_text()
    assert "base64" in content and "<h2>h</h2>" in content


def test_frozen_config_hash_and_eq():
    a = FrozenConfig(x=1, y=[1, 2], z={"a": 3})
    b = FrozenConfig(y=[1, 2], x=1, z={"a": 3})
    assert a == b and hash(a) == hash(b)
    assert a.z.a == 3
    c = a.replace(x=9)
    assert c.x == 9 and a.x == 1
    assert a.to_dict() == {"x": 1, "y": [1, 2], "z": {"a": 3}}
    with pytest.raises(AttributeError):
        _ = a.missing
