"""Dependency-free TensorBoard event writer (utils/tbevents.py).

The reference's Lightning fits always write TB event files (the default
logger); this pins our writer's wire format: CRC-32C check vector, the
TFRecord framing, scalar Event round-trips, and the trainer integration
(<checkpoint_root>/tb/events.out.tfevents.* appears on every fit and
parses back to the history metrics).
"""

import struct
from pathlib import Path

import numpy as np
import pytest

from xmm_superres_denoise_tpu.utils.tbevents import (
    TBEventWriter,
    crc32c,
    encode_file_version_event,
    encode_scalar_event,
    frame_record,
    read_scalar_events,
)


def test_crc32c_check_vector():
    """The standard CRC-32C (Castagnoli) check value — an implementation
    that disagrees here would frame records TB rejects."""
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0x0


def test_frame_record_layout():
    payload = b"hello"
    rec = frame_record(payload)
    (length,) = struct.unpack_from("<Q", rec, 0)
    assert length == len(payload)
    assert rec[12 : 12 + length] == payload
    assert len(rec) == 12 + length + 4


def test_scalar_roundtrip(tmp_path):
    w = TBEventWriter(tmp_path)
    w.add_scalar("val/loss", 0.25, step=3, wall_time=123.5)
    w.add_scalars({"train/loss": 1.5, "val/linear/psnr": 30.0}, step=4)
    w.close()
    events = read_scalar_events(w.path)
    assert ("val/loss", 3, 0.25) in [(t, s, v) for (_, s, t, v) in events]
    by_tag = {t: (s, v) for (_, s, t, v) in events}
    assert by_tag["train/loss"] == (4, 1.5)
    assert by_tag["val/linear/psnr"] == (4, 30.0)
    wall = [wt for (wt, s, t, _) in events if t == "val/loss"]
    assert wall == [123.5]


def test_reader_rejects_corruption(tmp_path):
    w = TBEventWriter(tmp_path)
    w.add_scalar("a", 1.0, step=0)
    w.close()
    blob = bytearray(w.path.read_bytes())
    blob[-3] ^= 0xFF  # flip a payload byte under the payload CRC
    bad = tmp_path / "bad"
    bad.write_bytes(bytes(blob))
    with pytest.raises(ValueError):
        read_scalar_events(bad)


def test_file_version_header_first():
    ev = encode_file_version_event(wall_time=1.0)
    assert b"brain.Event:2" in ev
    # a scalar event must not carry the version field
    assert b"brain.Event:2" not in encode_scalar_event("t", 1.0, 0, 1.0)


def test_trainer_writes_tb_events(tmp_path):
    """Every fit produces a parseable event file mirroring history.jsonl
    (Lightning-default-logger parity)."""
    import json

    from tests.test_train_loop import _boring_cfg, _model_cfg

    from xmm_superres_denoise_tpu.config import LossCfg, MeshCfg, TrainerCfg
    from xmm_superres_denoise_tpu.data import XmmDataModule
    from xmm_superres_denoise_tpu.train import Trainer, create_loss

    ds_cfg = _boring_cfg(tmp_path)
    dm = XmmDataModule(ds_cfg, splits_root=tmp_path / "splits", boring_size=32)
    tr_cfg = TrainerCfg(epochs=2, checkpoint_root=tmp_path / "ckpt",
                        mesh=MeshCfg(data="auto", fsdp=1))
    loss = create_loss(None, LossCfg(l1=1.0))
    t = Trainer(_model_cfg(), tr_cfg, dm, loss, metric_names=["psnr"])
    t.fit(seed=0)

    tb_files = list((t.ckpt.root / "tb").glob("events.out.tfevents.*"))
    assert len(tb_files) == 1
    events = read_scalar_events(tb_files[0])
    by_step = {}
    for _, step, tag, value in events:
        by_step.setdefault(step, {})[tag] = value

    history = [json.loads(l) for l in
               (t.ckpt.root / "history.jsonl").read_text().splitlines()]
    assert sorted(by_step) == [h["epoch"] for h in history]
    for h in history:
        got = by_step[h["epoch"]]
        assert "epoch" not in got  # the step IS the epoch
        for k, v in h.items():
            if k == "epoch" or not isinstance(v, float):
                continue
            assert k in got, k
            np.testing.assert_allclose(got[k], v, rtol=1e-6)
