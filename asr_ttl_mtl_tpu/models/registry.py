"""Checkpoint registry, torch-format import, and the model container.

Equivalent of reference `whisper/__init__.py:17-160` (URL+SHA registry,
download, load) — re-targeted at jax: the torch `.pt` checkpoint is read on
host (torch CPU) and converted into the functional parameter pytree used by
:mod:`asr_ttl_mtl_tpu.models.whisper`.
"""

from __future__ import annotations

import hashlib
import io
import os
import urllib.request
import warnings
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .dims import ModelDimensions, PRESET_DIMS
from . import whisper as W

_BASE = "https://openaipublic.azureedge.net/main/whisper/models"

# sha256 -> filename of the official checkpoints (public registry data,
# mirrors reference whisper/__init__.py:17-32)
_CHECKPOINT_SHAS = {
    "tiny.en": "d3dd57d32accea0b295c96e26691aa14d8822fac7d9d27d5dc00b4ca2826dd03",
    "tiny": "65147644a518d12f04e32d6f3b26facc3f8dd46e5390956a9424a650c0ce22b9",
    "base.en": "25a8566e1d0c1e2231d1c762132cd20e0f96a85d16145c3a00adf5d1ac670ead",
    "base": "ed3a0b6b1c0edf879ad9b11b1af5a0e6ab5db9205f891f668f8b0e6c6326e34e",
    "small.en": "f953ad0fd29cacd07d5a9eda5624af0f6bcf2258be67c92b79389873d91e0872",
    "small": "9ecf779972d90ba49c06d968637d720dd632c55bbf19d441fb42bf17a411e794",
    "medium.en": "d7440d1dc186f76616474e0ff0b3b6b879abc9d1a4926b7adfa41db2d497ab4f",
    "medium": "345ae4da62f9b3d59415adc60127b97c714f32e89e936602e85993674d08dcb1",
    "large-v1": "e4b87e7e0bf463eb8e6956e646f1e277e901512310def2c24bf0e11bd3c28e9a",
    "large-v2": "81f7c96c852ee8fc832187b0132e569d6c3065a3252ed18e56effd0b6a73e524",
    "large-v3": "e5b1a55b89c1367dacf97e3e19bfd829a01529dbfdeefa8caeb59b3f1b81dadb",
    "large": "e5b1a55b89c1367dacf97e3e19bfd829a01529dbfdeefa8caeb59b3f1b81dadb",
    "large-v3-turbo": "aff26ae408abcba5fbf8813c21e62b0941638c5f6eebfb145be0c9839262a19a",
    "turbo": "aff26ae408abcba5fbf8813c21e62b0941638c5f6eebfb145be0c9839262a19a",
}

_CHECKPOINT_URLS = {
    name: f"{_BASE}/{sha}/{name if name not in ('large', 'turbo') else ('large-v3' if name == 'large' else 'large-v3-turbo')}.pt"
    for name, sha in _CHECKPOINT_SHAS.items()
}

# base85/gzip-encoded (n_text_layer, n_text_head) bool masks of the
# cross-attention heads used for word-level timing (public registry data,
# mirrors reference whisper/__init__.py:36-51)
_ALIGNMENT_HEADS = {
    "tiny.en": b"ABzY8J1N>@0{>%R00Bk>$p{7v037`oCl~+#00",
    "tiny": b"ABzY8bu8Lr0{>%RKn9Fp%m@SkK7Kt=7ytkO",
    "base.en": b"ABzY8;40c<0{>%RzzG;p*o+Vo09|#PsxSZm00",
    "base": b"ABzY8KQ!870{>%RzyTQH3`Q^yNP!>##QT-<FaQ7m",
    "small.en": b"ABzY8>?_)10{>%RpeA61k&I|OI3I$65C{;;pbCHh0B{qLQ;+}v00",
    "small": b"ABzY8DmU6=0{>%Rpa?J`kvJ6qF(V^F86#Xh7JUGMK}P<N0000",
    "medium.en": b"ABzY8usPae0{>%R7<zz_OvQ{)4kMa0BMw6u5rT}kRKX;$NfYBv00*Hl@qhsU00",
    "medium": b"ABzY8B0Jh+0{>%R7}kK1fFL7w6%<-Pf*t^=N)Qr&0RR9",
    "large-v1": b"ABzY8r9j$a0{>%R7#4sLmoOs{s)o3~84-RPdcFk!JR<kSfC2yj",
    "large-v2": b"ABzY8zd+h!0{>%R7=D0pU<_bnWW*tkYAhobTNnu$jnkEkXqp)j;w1Tzk)UH3X%SZd&fFZ2fC2yj",
    "large-v3": b"ABzY8gWO1E0{>%R7(9S+Kn!D~%ngiGaR?*L!iJG9p-nab0JQ=-{D1-g00",
    "large": b"ABzY8gWO1E0{>%R7(9S+Kn!D~%ngiGaR?*L!iJG9p-nab0JQ=-{D1-g00",
    "large-v3-turbo": b"ABzY8j^C+e0{>%RARaKHP%t(lGR*)0g!tONPyhe`",
    "turbo": b"ABzY8j^C+e0{>%RARaKHP%t(lGR*)0g!tONPyhe`",
}


def available_models() -> List[str]:
    """Names of the official checkpoints this registry can fetch."""
    return list(_CHECKPOINT_URLS.keys())


def _download(url: str, sha256: str, root: str) -> str:
    os.makedirs(root, exist_ok=True)
    target = os.path.join(root, os.path.basename(url))
    if os.path.exists(target) and not os.path.isfile(target):
        raise RuntimeError(f"{target} exists and is not a regular file")
    if os.path.isfile(target):
        with open(target, "rb") as f:
            if hashlib.sha256(f.read()).hexdigest() == sha256:
                return target
        warnings.warn(f"{target} exists but SHA256 mismatch; re-downloading")
    with urllib.request.urlopen(url) as src, open(target, "wb") as out:
        while True:
            buf = src.read(1 << 20)
            if not buf:
                break
            out.write(buf)
    with open(target, "rb") as f:
        if hashlib.sha256(f.read()).hexdigest() != sha256:
            raise RuntimeError("Downloaded checkpoint failed SHA256 verification; retry")
    return target


# ---------------------------------------------------------------------------
# torch-format conversion
# ---------------------------------------------------------------------------


def _t(x) -> jnp.ndarray:  # torch tensor -> jnp, transposing linear weights
    return jnp.asarray(np.ascontiguousarray(x.detach().cpu().numpy().T))


def _a(x) -> jnp.ndarray:
    return jnp.asarray(x.detach().cpu().numpy())


def convert_torch_state_dict(dims: ModelDimensions, sd: Dict[str, Any]) -> W.Params:
    """Convert an OpenAI/reference torch `model_state_dict` into our pytree.

    Linear weights move from torch (out, in) to (in, out); conv weights keep
    torch (O, I, K) layout; LayerNorm weight/bias become scale/bias.
    """

    def lin(prefix, bias=True):
        p = {"w": _t(sd[f"{prefix}.weight"])}
        if bias:
            p["b"] = _a(sd[f"{prefix}.bias"])
        return p

    def ln(prefix):
        return {"scale": _a(sd[f"{prefix}.weight"]), "bias": _a(sd[f"{prefix}.bias"])}

    def attn(prefix):
        return {
            "query": lin(f"{prefix}.query"),
            "key": lin(f"{prefix}.key", bias=False),
            "value": lin(f"{prefix}.value"),
            "out": lin(f"{prefix}.out"),
        }

    def block(prefix, cross: bool):
        b = {
            "attn": attn(f"{prefix}.attn"),
            "attn_ln": ln(f"{prefix}.attn_ln"),
            "mlp": {"fc1": lin(f"{prefix}.mlp.0"), "fc2": lin(f"{prefix}.mlp.2")},
            "mlp_ln": ln(f"{prefix}.mlp_ln"),
        }
        if cross:
            b["cross_attn"] = attn(f"{prefix}.cross_attn")
            b["cross_attn_ln"] = ln(f"{prefix}.cross_attn_ln")
        return b

    encoder = {
        "conv1": {"w": _a(sd["encoder.conv1.weight"]), "b": _a(sd["encoder.conv1.bias"])},
        "conv2": {"w": _a(sd["encoder.conv2.weight"]), "b": _a(sd["encoder.conv2.bias"])},
        "blocks": [
            block(f"encoder.blocks.{i}", cross=False) for i in range(dims.n_audio_layer)
        ],
        "ln_post": ln("encoder.ln_post"),
    }
    decoder = {
        "token_embedding": _a(sd["decoder.token_embedding.weight"]),
        "positional_embedding": _a(sd["decoder.positional_embedding"]),
        "blocks": [
            block(f"decoder.blocks.{i}", cross=True) for i in range(dims.n_text_layer)
        ],
        "ln": ln("decoder.ln"),
    }
    return {"encoder": encoder, "decoder": decoder}


def export_torch_state_dict(params: W.Params, dims: ModelDimensions) -> Dict[str, Any]:
    """Inverse of convert_torch_state_dict (for `.pt`-compatible export)."""
    import torch

    sd: Dict[str, Any] = {}

    def put(name, arr, transpose=False):
        a = np.asarray(arr)
        if transpose:
            a = a.T
        # force a writable copy: jax arrays view as read-only numpy, and
        # torch.from_numpy on a read-only view warns (undefined on write)
        sd[name] = torch.from_numpy(np.array(a, copy=True, order="C"))

    def lin(prefix, p):
        put(f"{prefix}.weight", p["w"], transpose=True)
        if "b" in p:
            put(f"{prefix}.bias", p["b"])

    def ln(prefix, p):
        put(f"{prefix}.weight", p["scale"])
        put(f"{prefix}.bias", p["bias"])

    def attn(prefix, p):
        lin(f"{prefix}.query", p["query"])
        lin(f"{prefix}.key", p["key"])
        lin(f"{prefix}.value", p["value"])
        lin(f"{prefix}.out", p["out"])

    enc = params["encoder"]
    put("encoder.conv1.weight", enc["conv1"]["w"])
    put("encoder.conv1.bias", enc["conv1"]["b"])
    put("encoder.conv2.weight", enc["conv2"]["w"])
    put("encoder.conv2.bias", enc["conv2"]["b"])
    put("encoder.positional_embedding", W.sinusoids(dims.n_audio_ctx, dims.n_audio_state))
    for i, b in enumerate(enc["blocks"]):
        attn(f"encoder.blocks.{i}.attn", b["attn"])
        ln(f"encoder.blocks.{i}.attn_ln", b["attn_ln"])
        lin(f"encoder.blocks.{i}.mlp.0", b["mlp"]["fc1"])
        lin(f"encoder.blocks.{i}.mlp.2", b["mlp"]["fc2"])
        ln(f"encoder.blocks.{i}.mlp_ln", b["mlp_ln"])
    ln("encoder.ln_post", enc["ln_post"])

    dec = params["decoder"]
    put("decoder.token_embedding.weight", dec["token_embedding"])
    put("decoder.positional_embedding", dec["positional_embedding"])
    for i, b in enumerate(dec["blocks"]):
        attn(f"decoder.blocks.{i}.attn", b["attn"])
        ln(f"decoder.blocks.{i}.attn_ln", b["attn_ln"])
        attn(f"decoder.blocks.{i}.cross_attn", b["cross_attn"])
        ln(f"decoder.blocks.{i}.cross_attn_ln", b["cross_attn_ln"])
        lin(f"decoder.blocks.{i}.mlp.0", b["mlp"]["fc1"])
        lin(f"decoder.blocks.{i}.mlp.2", b["mlp"]["fc2"])
        ln(f"decoder.blocks.{i}.mlp_ln", b["mlp_ln"])
    ln("decoder.ln", dec["ln"])
    return sd


# ---------------------------------------------------------------------------
# model container
# ---------------------------------------------------------------------------


@dataclass
class WhisperModel:
    """Thin container: dims + parameter pytree + alignment-head mask.

    All compute goes through the pure functions in models.whisper; this class
    only carries state and offers the reference-compatible convenience API.
    """

    dims: ModelDimensions
    params: W.Params
    alignment_heads: np.ndarray = None  # bool (n_text_layer, n_text_head)
    compute_dtype: Any = jnp.float32
    name: str = ""
    extra: Dict[str, Any] = field(default_factory=dict)  # e.g. MTL classifier head

    def __post_init__(self):
        if self.alignment_heads is None:
            self.alignment_heads = W.default_alignment_heads(self.dims)

    @property
    def has_disease_tokens(self) -> bool:
        """True for MTL-fine-tuned checkpoints whose vocab was expanded with
        the disease tokens (51864->51868 en-only, 51865->51869 multilingual —
        SURVEY.md §5 quirk 3). Decoding/transcription must then build the
        disease-spliced tokenizer or every special-token ID past the language
        block is shifted (the reference itself mis-maps here; we don't)."""
        return self.dims.n_vocab in (51868, 51869)

    @property
    def is_multilingual(self) -> bool:
        if self.has_disease_tokens:
            return self.dims.n_vocab == 51869
        return self.dims.n_vocab >= 51865

    @property
    def num_languages(self) -> int:
        if self.has_disease_tokens:
            return 99  # the expansion starts from the 99-language vocab
        return self.dims.n_vocab - 51765 - int(self.is_multilingual)

    def set_alignment_heads(self, dump: bytes) -> None:
        self.alignment_heads = W.decode_alignment_heads_dump(self.dims, dump)

    # --- compute ---

    def embed_audio(self, mel: jnp.ndarray) -> jnp.ndarray:
        return W.encoder_apply(self.params, self.dims, mel, self.compute_dtype)

    def logits(self, tokens: jnp.ndarray, audio_features: jnp.ndarray) -> jnp.ndarray:
        out, _, _ = W.decoder_apply(
            self.params, self.dims, tokens, audio_features, compute_dtype=self.compute_dtype
        )
        return out

    def forward(self, mel: jnp.ndarray, tokens: jnp.ndarray) -> jnp.ndarray:
        return W.model_apply(self.params, self.dims, mel, tokens, self.compute_dtype)

    def resize_token_embeddings(self, new_vocab_size: int, seed: int = 0) -> None:
        self.params, self.dims = W.resize_token_embeddings(
            self.params, self.dims, new_vocab_size, jax.random.PRNGKey(seed)
        )

    # --- reference-compatible high-level API (late imports avoid cycles) ---

    def decode(self, mel, options=None, **kwargs):
        from ..decoding import decode

        return decode(self, mel, options, **kwargs)

    def detect_language(self, mel, tokenizer=None):
        from ..decoding import detect_language

        return detect_language(self, mel, tokenizer)

    def transcribe(self, audio, **kwargs):
        from ..transcribe import transcribe

        return transcribe(self, audio, **kwargs)


def load_model(
    name: str,
    device: Optional[Any] = None,
    download_root: Optional[str] = None,
    in_memory: bool = False,
    compute_dtype: Any = None,
) -> WhisperModel:
    """Load an official checkpoint by name, or any local `.pt` path.

    The `.pt` format read here is exactly the reference's
    (`{"dims": {...}, "model_state_dict": {...}}`, whisper/__init__.py:150-155).
    """
    import torch

    if download_root is None:
        default = os.path.join(os.path.expanduser("~"), ".cache")
        download_root = os.path.join(os.getenv("XDG_CACHE_HOME", default), "asr_ttl_mtl_tpu")

    alignment_dump = None
    if name in _CHECKPOINT_URLS:
        # allow a pre-seeded local file (e.g. from the reference's cache)
        local = _find_cached_checkpoint(name, download_root)
        checkpoint_path = local or _download(
            _CHECKPOINT_URLS[name], _CHECKPOINT_SHAS[name], download_root
        )
        alignment_dump = _ALIGNMENT_HEADS[name]
    elif os.path.isfile(name):
        checkpoint_path = name
    else:
        raise RuntimeError(
            f"Model {name} not found; available models = {available_models()}"
        )

    if in_memory:
        with open(checkpoint_path, "rb") as fp:
            ckpt = torch.load(io.BytesIO(fp.read()), map_location="cpu", weights_only=False)
    else:
        ckpt = torch.load(checkpoint_path, map_location="cpu", weights_only=False)

    dims = ModelDimensions(**ckpt["dims"]) if isinstance(ckpt["dims"], dict) else ckpt["dims"]
    params = convert_torch_state_dict(dims, ckpt["model_state_dict"])
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16 if any(
            d.platform == "tpu" for d in jax.devices()
        ) else jnp.float32

    model = WhisperModel(dims=dims, params=params, compute_dtype=compute_dtype, name=name)
    if alignment_dump is not None:
        model.set_alignment_heads(alignment_dump)
    if device is not None:
        model.params = jax.device_put(model.params, device)
    return model


def _find_cached_checkpoint(name: str, download_root: str) -> Optional[str]:
    fname = os.path.basename(_CHECKPOINT_URLS[name])
    candidates = [
        os.path.join(download_root, fname),
        os.path.join(os.path.expanduser("~"), ".cache", "whisper", fname),
    ]
    if os.environ.get("ASRMTL_CHECKPOINT_DIR"):
        candidates.insert(0, os.path.join(os.environ["ASRMTL_CHECKPOINT_DIR"], fname))
    for c in candidates:
        if os.path.isfile(c):
            with open(c, "rb") as f:
                if hashlib.sha256(f.read()).hexdigest() == _CHECKPOINT_SHAS[name]:
                    return c
    return None


def from_random(
    name_or_dims, seed: int = 0, compute_dtype: Any = jnp.float32
) -> WhisperModel:
    """Randomly initialized model (for tests and benchmarks without weights)."""
    dims = PRESET_DIMS[name_or_dims] if isinstance(name_or_dims, str) else name_or_dims
    params = init_params_cached(dims, seed)
    return WhisperModel(
        dims=dims,
        params=params,
        compute_dtype=compute_dtype,
        name=name_or_dims if isinstance(name_or_dims, str) else "custom",
    )


def init_params_cached(dims: ModelDimensions, seed: int) -> W.Params:
    return W.init_params(jax.random.PRNGKey(seed), dims)
