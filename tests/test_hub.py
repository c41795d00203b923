"""Hub-aware checkpoint resolution (vap_tpu/utils/hub.py): local paths pass
through, uncached hub ids fail clearly offline, and diffusers variant weight
naming is honored."""

import os

import pytest

from vap_tpu.utils.hub import resolve_model_dir, variant_weight_files


def test_resolve_local_dir_passthrough(tmp_path):
    assert resolve_model_dir(str(tmp_path)) == str(tmp_path)


def test_resolve_uncached_id_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="not a local directory"):
        resolve_model_dir("definitely/not-a-cached-repo",
                          cache_dir=str(tmp_path / "cache"))


def _touch(d, *names):
    for n in names:
        (d / n).write_bytes(b"")


def test_variant_weight_files(tmp_path):
    _touch(tmp_path, "diffusion_pytorch_model.safetensors",
           "diffusion_pytorch_model.fp16.safetensors",
           "config.json")
    got = variant_weight_files(str(tmp_path), "fp16")
    assert [os.path.basename(f) for f in got] == \
        ["diffusion_pytorch_model.fp16.safetensors"]
    got = variant_weight_files(str(tmp_path), None)
    assert [os.path.basename(f) for f in got] == \
        ["diffusion_pytorch_model.safetensors"]
    # requesting a variant that doesn't exist falls back to the plain files
    got = variant_weight_files(str(tmp_path), "bf16")
    assert [os.path.basename(f) for f in got] == \
        ["diffusion_pytorch_model.safetensors"]


def test_variant_weight_files_sharded(tmp_path):
    _touch(tmp_path,
           "model-00001-of-00002.safetensors",
           "model-00002-of-00002.safetensors",
           "model.fp16-00001-of-00002.safetensors",
           "model.fp16-00002-of-00002.safetensors")
    got = variant_weight_files(str(tmp_path), "fp16")
    assert [os.path.basename(f) for f in got] == [
        "model.fp16-00001-of-00002.safetensors",
        "model.fp16-00002-of-00002.safetensors"]
    got = variant_weight_files(str(tmp_path))
    assert [os.path.basename(f) for f in got] == [
        "model-00001-of-00002.safetensors",
        "model-00002-of-00002.safetensors"]


def test_variant_only_directory(tmp_path):
    """No plain files: a single foreign variant loads (better than nothing),
    but MULTIPLE variant tags must not silently merge."""
    _touch(tmp_path, "model.fp16.safetensors")
    got = variant_weight_files(str(tmp_path), None)
    assert [os.path.basename(f) for f in got] == ["model.fp16.safetensors"]
    _touch(tmp_path, "model.bf16.safetensors")
    with pytest.raises(FileNotFoundError, match="multiple"):
        variant_weight_files(str(tmp_path), None)
    # explicit variant still resolves
    got = variant_weight_files(str(tmp_path), "bf16")
    assert [os.path.basename(f) for f in got] == ["model.bf16.safetensors"]


def test_empty_directory_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="no .safetensors"):
        variant_weight_files(str(tmp_path))
