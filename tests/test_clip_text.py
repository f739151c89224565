"""Native CLIP text tower: tokenizer mechanics + converter forward parity.

The torch side reconstructs CLIP's text transformer exactly (pre-LN blocks,
``nn.MultiheadAttention`` fused qkv, QuickGELU, EOT pooling + projection) so
``convert_clip_text`` is exercised against the real state-dict key layout
(``transformer.resblocks.N.attn.in_proj_weight`` …).  cf. the reference's
CLIP usage at ``lidargen/dataset/transforms_3d/scene_graph/
scene_graph.py:146-164``.
"""

import gzip
from collections import OrderedDict

import numpy as np
import pytest
import torch
from torch import nn as tnn

import jax.numpy as jnp

from lidarcrafter_tpu.models.clip_text import CLIPTextEncoder
from lidarcrafter_tpu.utils.clip_tokenizer import CLIPTokenizer, bytes_to_unicode
from lidarcrafter_tpu.utils.torch_ckpt import convert_clip_text


# ------------------------------------------------------------------ tokenizer


@pytest.fixture(scope="module")
def bpe_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("clip") / "bpe_test_vocab.txt.gz"
    merges = [
        "#version: test",
        "c a",
        "ca r</w>",
        "t r",
        "u c",
        "tr uc",
        "truc k</w>",
        "w i",
        "wi l",
        "wil l</w>",
    ]
    with gzip.open(path, "wt") as f:
        f.write("\n".join(merges))
    return path


def test_bytes_to_unicode_roundtrip():
    m = bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256


def test_bpe_merges_applied(bpe_path):
    tok = CLIPTokenizer(bpe_path)
    # 'car' fully merges into one token; 'truck' into 'truc'+'k</w>'… merged
    assert tok._bpe("car") == "car</w>"
    assert tok._bpe("truck") == "truck</w>"
    # unknown words fall back to chars with the end-of-word marker
    assert tok._bpe("zq") == "z q</w>"


def test_tokenize_shape_and_specials(bpe_path):
    tok = CLIPTokenizer(bpe_path)
    out = tok.tokenize(["a car", "truck will park"], context_length=16)
    assert out.shape == (2, 16) and out.dtype == np.int32
    assert (out[:, 0] == tok.sot).all()
    for row in out:
        nz = row[row > 0]
        assert nz[-1] == tok.eot
    # EOT is the largest id → argmax pooling finds it
    assert out.max() == tok.eot
    # deterministic
    np.testing.assert_array_equal(out, tok.tokenize(["a car", "truck will park"], 16))


def test_tokenize_truncation(bpe_path):
    tok = CLIPTokenizer(bpe_path)
    out = tok.tokenize(["car " * 50], context_length=8)
    assert out.shape == (1, 8) and out[0, -1] == tok.eot
    with pytest.raises(RuntimeError):
        tok.tokenize(["car " * 50], context_length=8, truncate=False)


def test_decode_roundtrip(bpe_path):
    tok = CLIPTokenizer(bpe_path)
    ids = tok.encode("a car will park")
    assert tok.decode(ids).strip() == "a car will park"


# ----------------------------------------------------------------- text tower


class _QuickGELU(tnn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class _Block(tnn.Module):
    def __init__(self, width, heads):
        super().__init__()
        self.attn = tnn.MultiheadAttention(width, heads)
        self.ln_1 = tnn.LayerNorm(width)
        self.mlp = tnn.Sequential(OrderedDict([
            ("c_fc", tnn.Linear(width, width * 4)),
            ("gelu", _QuickGELU()),
            ("c_proj", tnn.Linear(width * 4, width)),
        ]))
        self.ln_2 = tnn.LayerNorm(width)

    def forward(self, x, mask):
        h = self.ln_1(x)
        x = x + self.attn(h, h, h, need_weights=False, attn_mask=mask)[0]
        return x + self.mlp(self.ln_2(x))


class _TorchCLIPText(tnn.Module):
    def __init__(self, vocab, ctx, width, heads, layers, embed_dim):
        super().__init__()
        self.token_embedding = tnn.Embedding(vocab, width)
        self.positional_embedding = tnn.Parameter(torch.randn(ctx, width) * 0.01)
        self.transformer = tnn.Module()
        self.transformer.resblocks = tnn.ModuleList(
            [_Block(width, heads) for _ in range(layers)]
        )
        self.ln_final = tnn.LayerNorm(width)
        self.text_projection = tnn.Parameter(torch.randn(width, embed_dim) * width**-0.5)

    def forward(self, tokens):
        L = tokens.shape[1]
        mask = torch.full((L, L), float("-inf")).triu(1)
        x = self.token_embedding(tokens) + self.positional_embedding[:L]
        x = x.permute(1, 0, 2)  # LND, CLIP layout
        for block in self.transformer.resblocks:
            x = block(x, mask)
        x = self.ln_final(x.permute(1, 0, 2))
        pooled = x[torch.arange(x.shape[0]), tokens.argmax(dim=-1)]
        return pooled @ self.text_projection


def test_text_tower_forward_parity():
    vocab, ctx, width, heads, layers, edim = 600, 24, 64, 4, 3, 48
    torch.manual_seed(0)
    tmodel = _TorchCLIPText(vocab, ctx, width, heads, layers, edim).eval()

    r = np.random.RandomState(0)
    tokens = np.zeros((3, ctx), np.int64)
    for i in range(3):
        n = r.randint(3, ctx - 1)
        tokens[i, 0] = vocab - 2  # SOT
        tokens[i, 1:n] = r.randint(1, vocab - 2, n - 1)
        tokens[i, n] = vocab - 1  # EOT (largest id)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(tokens)).numpy()

    jmodel = CLIPTextEncoder(
        vocab_size=vocab, context_length=ctx, width=width,
        heads=heads, layers=layers, embed_dim=edim,
    )
    params = convert_clip_text(
        {k: v.numpy() for k, v in tmodel.state_dict().items()}
    )
    got = np.asarray(jmodel.apply(params, jnp.asarray(tokens.astype(np.int32))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_load_clip_text_encoder_end_to_end(tmp_path, bpe_path):
    """Saved state_dict + merges file → encode_fn drop-in for the assigner."""
    from lidarcrafter_tpu.models.clip_text import load_clip_text_encoder

    tok = CLIPTokenizer(bpe_path)
    vocab = len(tok.encoder)
    torch.manual_seed(1)
    # width 128 → 2 heads under the loader's CLIP heads=width/64 convention
    tmodel = _TorchCLIPText(vocab, 77, 128, 2, 2, 512).eval()
    ckpt = tmp_path / "clip_text.pt"
    torch.save(tmodel.state_dict(), ckpt)

    encode_fn, tok2, model, variables = load_clip_text_encoder(
        ckpt, bpe_path, jit=False
    )
    assert model.vocab_size == vocab and model.layers == 2
    feats = encode_fn(["a car will park", "truck"])
    assert feats.shape == (2, 512) and np.isfinite(feats).all()

    with torch.no_grad():
        want = tmodel(torch.from_numpy(
            tok.tokenize(["a car will park", "truck"], 77).astype(np.int64)
        )).numpy()
    np.testing.assert_allclose(feats, want, rtol=1e-4, atol=1e-5)
