"""Codec differential vs the JDK's javax.imageio (round-8 ask #1).

jpeg_lite / png_lite vs an INDEPENDENTLY AUTHORED codec. The JVM is a
hard dependency of pyspark, so unlike a Pillow-based differential this
actually runs in the engine's own container; the skip only fires on a
JRE-only box (no javac).  Full-size runs: ``python
tools/codec_differential.py`` (CI cadence); this test pins a bounded,
seeded slice of the same case generator.
"""

import numpy as np
import pytest

from tools.codec_differential import (
    JvmCodec,
    jvm_available,
    run_jpeg_cases,
    run_png_cases,
)

pytestmark = pytest.mark.skipif(
    not jvm_available(), reason="javac/java not on PATH"
)


@pytest.fixture(scope="module")
def codec():
    c = JvmCodec()
    yield c
    c.close()


def test_png_differential_vs_imageio(codec):
    """PNG-A (ImageIO-encoded -> png_lite == original, exact) and PNG-B
    (hand-built random filters/Adam7/all modes -> both decoders agree
    exactly)."""
    failures = run_png_cases(codec, np.random.default_rng(20260815), 60)
    assert failures == []


def test_jpeg_differential_vs_imageio(codec):
    """ImageIO-encoded baseline+progressive JPEGs decoded by both
    jpeg_lite and ImageIO agree within the T.81/IEEE-1180 IDCT rounding
    contract (gray/R=G=B <= 2; flat color <= 4 via BT.601 chroma
    amplification - derivation in tools/codec_differential.py)."""
    failures = run_jpeg_cases(codec, np.random.default_rng(20260815), 60)
    assert failures == []
