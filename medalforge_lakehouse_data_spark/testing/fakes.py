"""Picklable fake codecs for tests/demos: the codec registry snapshots
callables into pandas-UDF closures, so they must resolve by module path
on executors — test-module-local functions do not."""

from __future__ import annotations


def fake_jpeg_decode(b: bytes):
    from medalforge_lakehouse_data_spark.functions import codec

    return codec.decode(b)


def fake_audio_features(b: bytes):
    return (float(len(b)) / 16000.0, 0.5)
