"""
Cosmos tokenizer inference libs: CI/DI/CV/DV autoencode smoke + shape
contracts (small spatial sizes, random weights).
"""

import numpy as np
import pytest

from uniception_tpu.models.libs.cosmos_tokenizer.image_lib import ImageTokenizer
from uniception_tpu.models.libs.cosmos_tokenizer.video_lib import CausalVideoTokenizer


def test_image_tokenizer_ci():
    tok = ImageTokenizer("CI", spatial_compression=8)
    x = np.random.RandomState(0).randn(1, 3, 64, 64).astype(np.float32).clip(-1, 1)
    latent = tok.encode(x)
    assert latent.shape == (1, 16, 8, 8)
    recon = np.asarray(tok.decode(latent))
    assert recon.shape == (1, 3, 64, 64)


def test_image_tokenizer_di():
    tok = ImageTokenizer("DI", spatial_compression=8)
    x = np.random.RandomState(0).randn(1, 3, 64, 64).astype(np.float32).clip(-1, 1)
    indices, codes = tok.encode(x)
    assert indices.shape == (1, 8, 8)
    assert codes.shape == (1, 6, 8, 8)
    recon = np.asarray(tok.decode(indices))
    assert recon.shape == (1, 3, 64, 64)


@pytest.mark.slow
def test_video_tokenizer_cv():
    tok = CausalVideoTokenizer("CV", spatial_compression=8, temporal_compression=4)
    x = np.random.RandomState(0).randn(1, 3, 5, 32, 32).astype(np.float32).clip(-1, 1)
    latent = tok.encode(x)
    assert latent.shape == (1, 16, 2, 4, 4)
    recon = np.asarray(tok.decode(latent))
    assert recon.shape == (1, 3, 5, 32, 32)


def test_video_tokenizer_dv():
    tok = CausalVideoTokenizer("DV", spatial_compression=8, temporal_compression=4)
    x = np.random.RandomState(0).randn(1, 3, 5, 32, 32).astype(np.float32).clip(-1, 1)
    indices, codes = tok.encode(x)
    assert indices.shape == (1, 2, 4, 4)
    recon = np.asarray(tok.decode(indices))
    assert recon.shape == (1, 3, 5, 32, 32)
