"""The package ships its data assets: a clean offline checkout must be able
to construct both tokenizers and the English normalizer with no reference
mount, no cache, and no network (reference carries these in-tree at
whisper/assets/{gpt2,multilingual}.tiktoken and whisper/normalizers/english.json).
"""

import hashlib
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "asr_ttl_mtl_tpu")

# Pinned upstream hashes (see asr_ttl_mtl_tpu/assets/PROVENANCE.md).
_SHIPPED = {
    os.path.join(PKG, "assets", "gpt2.tiktoken"): (
        "ccf876776dd2a896257e3427ff8627bd1d3538023617d507ebba654d57d36557"
    ),
    os.path.join(PKG, "assets", "multilingual.tiktoken"): (
        "febeed8e568f92d9ca984580bc2e6b605b867dc5ba4486f9646de381b44a8226"
    ),
    os.path.join(PKG, "normalizers", "english.json"): (
        "fe59aa7a85cd73cd20a6cb99f0c573bfa5235f720baa570e53576af05167f0bb"
    ),
}


@pytest.mark.quick
def test_shipped_assets_present_with_pinned_hashes():
    for path, want in _SHIPPED.items():
        assert os.path.isfile(path), f"missing shipped asset: {path}"
        got = hashlib.sha256(open(path, "rb").read()).hexdigest()
        assert got == want, f"{path}: sha256 {got} != pinned {want}"


@pytest.mark.quick
def test_offline_construction_without_reference_mount(tmp_path):
    """Subprocess with the reference dir pointed at /nonexistent, an empty
    XDG cache, and no ASRMTL_ASSET_DIR: tokenizers (both vocabs, disease
    mode) and EnglishTextNormalizer must construct from the shipped files
    and reproduce the pinned special-token IDs."""
    env = dict(os.environ)
    env.pop("ASRMTL_ASSET_DIR", None)
    env["ASRMTL_REFERENCE_DIR"] = "/nonexistent"
    env["XDG_CACHE_HOME"] = str(tmp_path / "empty_cache")
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    prog = r"""
import json
from asr_ttl_mtl_tpu.tokenizer import get_tokenizer
from asr_ttl_mtl_tpu.normalizers import EnglishTextNormalizer

multi = get_tokenizer(multilingual=True, include_diseases=True, language="en", task="transcribe")
en = get_tokenizer(multilingual=False, include_diseases=True)
norm = EnglishTextNormalizer()
assert norm.standardize_spellings.mapping, "spelling map empty (english.json not shipped)"
print(json.dumps({
    "multi": [multi.eot, multi.sot, sorted(multi.disease_tokens.values())],
    "en": [en.eot, en.sot, sorted(en.disease_tokens.values())],
    "norm": norm("His behaviour organised 2 grey aeroplanes"),
    "roundtrip": multi.decode(multi.encode("hello world")),
}))
"""
    out = subprocess.run(
        [sys.executable, "-c", prog], env=env, capture_output=True, text=True, timeout=300
    )
    assert out.returncode == 0, f"offline construction failed:\n{out.stderr}"
    got = json.loads(out.stdout.strip().splitlines()[-1])
    assert got["multi"] == [50257, 50258, [50359, 50360, 50361]]
    assert got["en"] == [50256, 50257, [50358, 50359, 50360]]
    assert got["norm"] == "his behavior organized 2 gray airplanes"
    assert got["roundtrip"] == "hello world"
