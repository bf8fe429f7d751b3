"""TensorBoard event-file writer: TFRecord framing + proto round trip."""

import glob
import struct

import numpy as np

from rnd_semantic_segmentation_tpu.utils.tb_writer import (
    SummaryWriter,
    _masked_crc,
    crc32c,
)


def test_crc32c_known_vectors():
    # RFC 3720 test vector: 32 bytes of zeros -> 0x8A9136AA
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"123456789") == 0xE3069283


def _read_records(path):
    records = []
    with open(path, "rb") as fh:
        while True:
            header = fh.read(8)
            if len(header) < 8:
                break
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", fh.read(4))
            assert hcrc == _masked_crc(header)
            data = fh.read(length)
            (dcrc,) = struct.unpack("<I", fh.read(4))
            assert dcrc == _masked_crc(data)
            records.append(data)
    return records


def test_writer_produces_valid_tfrecords(tmp_path, rng):
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("loss", 0.5, step=1)
    w.add_scalar("loss", 0.25, step=2)
    w.add_image("grid", (rng.rand(8, 8, 3) * 255).astype(np.uint8), step=1)
    w.close()
    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1
    records = _read_records(files[0])
    assert len(records) == 4  # file_version + 2 scalars + 1 image
    assert b"brain.Event:2" in records[0]
    assert b"loss" in records[1]
    assert b"grid" in records[3]
    assert b"\x89PNG" in records[3]  # embedded PNG
