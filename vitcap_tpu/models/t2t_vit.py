"""T2T-ViT (the reference zoo's vendored t2t_vit package,
t2t_vit/t2t_vit.py:44-200 + token_transformer.py + transformer_block.py).

Both tokenization families are implemented:

- `transformer` variants (T2t_vit_t_14/19/24): straight from the vendored
  token_transformer.py.
- `performer` variants (T2t_vit_7/10/12/14/19/24/14_resnext/14_wide): the
  vendored token_performer.py is TRUNCATED (the class ends mid-definition
  at '# updating' with no forward method) AND its surviving __init__
  disagrees with the vendored call sites (t2t_vit.py:67 passes
  dim=token_dim, in_dim=in_chans*7*7 while the truncated kqv layer maps
  dim->3*dim, which cannot consume the 147-wide unfold tokens) — the
  reference crashes if these models are instantiated.  We implement the
  PUBLISHED upstream Token_performer semantics (the yitu-opensource
  T2T-ViT release, whose state-dict shapes the pretrained checkpoints
  follow): emb = token_dim, kqv Linear(in_width, 3*emb), positive
  random-feature kernel attention exp(w^T x - |x|^2/2)/sqrt(m) with a
  frozen orthogonal projection w (m = emb/2), v-residual skip, then an
  emb->emb MLP residual.  This goes beyond the reference (which is dead
  code per SURVEY §2.7) so its registry names resolve to working models.

The dense/ghost/se sub-files are never imported
(t2t_vit/__init__.py comments out all imports) and stay unimplemented.

Functional NHWC->tokens, eval semantics:

- T2T module: unfold(7,4,2) -> Token_transformer(147 -> 64) ->
  unfold(3,2,1) -> Token_transformer(576 -> 64) -> unfold(3,2,1) ->
  linear project to embed_dim (t2t_vit.py:51-101).  Token_transformer
  (token_transformer.py:13-60): x = attn(ln(x)) with the v-residual
  quirk (out = v + proj(attn@v)), then x += mlp(ln(x)).
- body: CLS token + FIXED sinusoid pos-embed (transformer_block.py:78-88)
  + standard pre-norm blocks (no qkv bias); the reference's pretrained
  loader overrides the attention scale to embed_dim**-0.5
  (t2t_vit.py:178-186 qk_scale hack), mirrored here when a checkpoint is
  loaded.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# name -> (embed_dim, depth, num_heads, mlp_ratio, tokens_type)
# configs: t2t_vit.py:180-298 @register_model entries
T2T_VITS = {
    "t2t_vit_t_14": (384, 14, 6, 3.0, "transformer"),
    "t2t_vit_t_19": (448, 19, 7, 3.0, "transformer"),
    "t2t_vit_t_24": (512, 24, 8, 3.0, "transformer"),
    "t2t_vit_7": (256, 7, 4, 2.0, "performer"),
    "t2t_vit_10": (256, 10, 4, 2.0, "performer"),
    "t2t_vit_12": (256, 12, 4, 2.0, "performer"),
    "t2t_vit_14": (384, 14, 6, 3.0, "performer"),
    "t2t_vit_19": (448, 19, 7, 3.0, "performer"),
    "t2t_vit_24": (512, 24, 8, 3.0, "performer"),
    "t2t_vit_14_resnext": (384, 14, 32, 3.0, "performer"),
    "t2t_vit_14_wide": (768, 4, 12, 3.0, "performer"),
}
TOKEN_DIM = 64


def t2t_feature_dim(variant: str) -> int:
    return T2T_VITS[variant][0]


def sinusoid_pos_embed(n_position: int, d_hid: int) -> jnp.ndarray:
    """transformer_block.py:78-88 get_sinusoid_encoding."""
    pos = np.arange(n_position)[:, None]
    j = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000, 2 * (j // 2) / d_hid)
    table = np.zeros((n_position, d_hid))
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return jnp.asarray(table[None], jnp.float32)


def _ln(x, p, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _lin(x, p):
    y = x @ p["w"]
    return y + p["b"] if "b" in p else y


def _unfold(x, k, stride, pad):
    """torch nn.Unfold on NHWC input -> (B, L, C*k*k) tokens with torch's
    (C, kh, kw) feature ordering."""
    B, H, W, C = x.shape
    patches = jax.lax.conv_general_dilated_patches(
        jnp.transpose(x, (0, 3, 1, 2)), (k, k), (stride, stride),
        [(pad, pad), (pad, pad)])          # (B, C*k*k, h, w), c-major
    B, F, h, w = patches.shape
    return patches.reshape(B, F, h * w).transpose(0, 2, 1), h, w


def _token_transformer(x, p, dim, in_dim):
    """token_transformer.py Token_transformer: single-head attention with
    the v-residual, then MLP residual."""
    y = _ln(x, p["norm1"])
    qkv = y @ p["qkv_w"]                   # (B, N, 3*in_dim), no bias
    q, k, v = jnp.split(qkv, 3, axis=-1)
    scale = dim ** -0.5                    # head_dim = dim (1 head)
    attn = jax.nn.softmax((q @ jnp.swapaxes(k, -1, -2)) * scale, axis=-1)
    out = attn @ v
    out = _lin(out, p["proj"])
    x = v + out                            # the v skip (the input changed
    #                                        width, token_transformer.py:40)
    h = _ln(x, p["norm2"])
    h = jax.nn.gelu(_lin(h, p["fc1"]), approximate=False)
    x = x + _lin(h, p["fc2"])
    return x


def _token_performer(x, p, eps=1e-8):
    """Published upstream Token_performer (see module docstring — the
    vendored copy is truncated).  Positive-random-feature kernel
    attention: SM(q,k) ~= E_w[exp(w^T q - |q|^2/2) exp(w^T k - |k|^2/2)],
    so attn(q,k,v) = qp (kp^T v) / (qp kp^T 1); frozen orthogonal w."""
    y = _ln(x, p["norm1"])
    kqv = _lin(y, p["kqv"])                 # note the reference's k,q,v
    k, q, v = jnp.split(kqv, 3, axis=-1)    # split ORDER (not q,k,v)
    m = p["w"].shape[0]

    def prm_exp(u):
        xd = (u * u).sum(-1, keepdims=True) / 2
        return jnp.exp(u @ p["w"].T - xd) / np.sqrt(m)

    kp, qp = prm_exp(k), prm_exp(q)         # (B, T, m)
    D = jnp.einsum("btm,bm->bt", qp, kp.sum(axis=1))[..., None]
    kptv = jnp.einsum("btn,btm->bnm", v, kp)      # (B, emb, m)
    y2 = jnp.einsum("btm,bnm->btn", qp, kptv) / (D + eps)
    y2 = v + _lin(y2, p["proj"])            # v skip, as token_transformer
    h = _ln(y2, p["norm2"])
    h = jax.nn.gelu(_lin(h, p["mlp1"]), approximate=False)
    return y2 + _lin(h, p["mlp2"])


def apply_t2t_vit(p: Params, images: jnp.ndarray, variant: str,
                  qk_scale: float = 0.0) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, 1+N, D) post-norm token sequence (CLS first;
    the reference forward_features returns x[:, 0], t2t_vit.py:155-170)."""
    embed, depth, heads, mlp_ratio, ttype = T2T_VITS[variant]
    tok = (_token_performer if ttype == "performer" else None)
    x, h, w = _unfold(images, 7, 4, 2)
    if tok is None:
        x = _token_transformer(x, p["attention1"], 3 * 7 * 7, TOKEN_DIM)
    else:
        x = tok(x, p["attention1"])
    B, N, C = x.shape
    x = x.reshape(B, h, w, C)
    x, h, w = _unfold(x, 3, 2, 1)
    if tok is None:
        x = _token_transformer(x, p["attention2"], TOKEN_DIM * 9, TOKEN_DIM)
    else:
        x = tok(x, p["attention2"])
    x = x.reshape(B, h, w, TOKEN_DIM)
    x, h, w = _unfold(x, 3, 2, 1)
    x = _lin(x, p["project"])
    cls = jnp.broadcast_to(p["cls_token"], (B, 1, embed))
    x = jnp.concatenate([cls, x], axis=1) + p["pos_embed"]
    hd = embed // heads
    scale = qk_scale if qk_scale else hd ** -0.5
    for bp in p["blocks"]:
        y = _ln(x, bp["norm1"])
        qkv = y @ bp["qkv_w"]              # no bias
        q, k, v = [a.reshape(B, -1, heads, hd).transpose(0, 2, 1, 3)
                   for a in jnp.split(qkv, 3, axis=-1)]
        attn = jax.nn.softmax((q @ jnp.swapaxes(k, -1, -2)) * scale, -1)
        o = (attn @ v).transpose(0, 2, 1, 3).reshape(B, -1, embed)
        x = x + _lin(o, bp["proj"])
        y = _ln(x, bp["norm2"])
        y = jax.nn.gelu(_lin(y, bp["fc1"]), approximate=False)
        x = x + _lin(y, bp["fc2"])
    return _ln(x, p["norm"])


def _tt_init(ks, dim, in_dim, mlp_hidden):
    def nrm(c):
        return {"scale": jnp.ones((c,), jnp.float32),
                "bias": jnp.zeros((c,), jnp.float32)}

    def lin(cin, cout, bias=True):
        p = {"w": jax.random.truncated_normal(
            next(ks), -2.0, 2.0, (cin, cout), jnp.float32) * 0.02}
        if bias:
            p["b"] = jnp.zeros((cout,), jnp.float32)
        return p

    return {"norm1": nrm(dim),
            "qkv_w": lin(dim, 3 * in_dim, bias=False)["w"],
            "proj": lin(in_dim, in_dim),
            "norm2": nrm(in_dim),
            "fc1": lin(in_dim, mlp_hidden),
            "fc2": lin(mlp_hidden, in_dim)}


def _tp_init(ks, dim, emb, kernel_ratio=0.5):
    """Performer tokenizer params: dim = input token width, emb = out."""
    def nrm(c):
        return {"scale": jnp.ones((c,), jnp.float32),
                "bias": jnp.zeros((c,), jnp.float32)}

    def lin(cin, cout):
        return {"w": jax.random.truncated_normal(
            next(ks), -2.0, 2.0, (cin, cout), jnp.float32) * 0.02,
            "b": jnp.zeros((cout,), jnp.float32)}

    m = int(emb * kernel_ratio)
    w = jax.nn.initializers.orthogonal()(next(ks), (m, emb), jnp.float32)
    return {"norm1": nrm(dim),
            "kqv": lin(dim, 3 * emb),
            "proj": lin(emb, emb),
            "norm2": nrm(emb),
            "mlp1": lin(emb, emb),
            "mlp2": lin(emb, emb),
            "w": w * np.sqrt(m)}            # frozen random features


def init_t2t_vit(rng: jax.Array, variant: str) -> Params:
    embed, depth, heads, mlp_ratio, ttype = T2T_VITS[variant]
    ks = iter(jax.random.split(rng, 20 + 8 * depth))

    def nrm(c):
        return {"scale": jnp.ones((c,), jnp.float32),
                "bias": jnp.zeros((c,), jnp.float32)}

    def lin(cin, cout, bias=True):
        p = {"w": jax.random.truncated_normal(
            next(ks), -2.0, 2.0, (cin, cout), jnp.float32) * 0.02}
        if bias:
            p["b"] = jnp.zeros((cout,), jnp.float32)
        return p

    if ttype == "performer":
        att1 = _tp_init(ks, 3 * 49, TOKEN_DIM)
        att2 = _tp_init(ks, TOKEN_DIM * 9, TOKEN_DIM)
    else:
        att1 = _tt_init(ks, 3 * 49, TOKEN_DIM, TOKEN_DIM)
        att2 = _tt_init(ks, TOKEN_DIM * 9, TOKEN_DIM, TOKEN_DIM)
    p: Params = {
        "attention1": att1,
        "attention2": att2,
        "project": lin(TOKEN_DIM * 9, embed),
        "cls_token": jax.random.truncated_normal(
            next(ks), -2.0, 2.0, (1, 1, embed), jnp.float32) * 0.02,
        "pos_embed": sinusoid_pos_embed(14 * 14 + 1, embed),
        "blocks": [],
        "norm": nrm(embed),
    }
    hidden = int(embed * mlp_ratio)
    for _ in range(depth):
        p["blocks"].append({
            "norm1": nrm(embed),
            "qkv_w": lin(embed, 3 * embed, bias=False)["w"],
            "proj": lin(embed, embed),
            "norm2": nrm(embed),
            "fc1": lin(embed, hidden),
            "fc2": lin(hidden, embed),
        })
    return p


def _w_lin(sd, key):
    return jnp.asarray(np.asarray(sd[key]).T, jnp.float32)


def _v(sd, key):
    return jnp.asarray(np.asarray(sd[key]), jnp.float32)


def _nrm_from(sd, base):
    return {"scale": _v(sd, base + ".weight"),
            "bias": _v(sd, base + ".bias")}


def _tt_from(sd, base):
    return {"norm1": _nrm_from(sd, base + ".norm1"),
            "qkv_w": _w_lin(sd, base + ".attn.qkv.weight"),
            "proj": {"w": _w_lin(sd, base + ".attn.proj.weight"),
                     "b": _v(sd, base + ".attn.proj.bias")},
            "norm2": _nrm_from(sd, base + ".norm2"),
            "fc1": {"w": _w_lin(sd, base + ".mlp.fc1.weight"),
                    "b": _v(sd, base + ".mlp.fc1.bias")},
            "fc2": {"w": _w_lin(sd, base + ".mlp.fc2.weight"),
                    "b": _v(sd, base + ".mlp.fc2.bias")}}


def _tp_from(sd, base):
    """Performer tokenizer state-dict keys (published naming:
    norm1/kqv/proj/norm2/mlp.0/mlp.2/w)."""
    return {"norm1": _nrm_from(sd, base + ".norm1"),
            "kqv": {"w": _w_lin(sd, base + ".kqv.weight"),
                    "b": _v(sd, base + ".kqv.bias")},
            "proj": {"w": _w_lin(sd, base + ".proj.weight"),
                     "b": _v(sd, base + ".proj.bias")},
            "norm2": _nrm_from(sd, base + ".norm2"),
            "mlp1": {"w": _w_lin(sd, base + ".mlp.0.weight"),
                     "b": _v(sd, base + ".mlp.0.bias")},
            "mlp2": {"w": _w_lin(sd, base + ".mlp.2.weight"),
                     "b": _v(sd, base + ".mlp.2.bias")},
            "w": _v(sd, base + ".w")}


def load_t2t_vit(params: Params, sd: Dict[str, Any], variant: str,
                 prefix: str = "") -> Params:
    """Load the reference T2T-ViT torch state-dict."""
    tok_from = (_tp_from if T2T_VITS[variant][4] == "performer"
                else _tt_from)
    p: Params = {
        "attention1": tok_from(sd, prefix + "tokens_to_token.attention1"),
        "attention2": tok_from(sd, prefix + "tokens_to_token.attention2"),
        "project": {
            "w": _w_lin(sd, prefix + "tokens_to_token.project.weight"),
            "b": _v(sd, prefix + "tokens_to_token.project.bias")},
        "cls_token": _v(sd, prefix + "cls_token"),
        "pos_embed": _v(sd, prefix + "pos_embed"),
        "blocks": [],
        "norm": _nrm_from(sd, prefix + "norm"),
    }
    for i in range(len(params["blocks"])):
        base = f"{prefix}blocks.{i}"
        p["blocks"].append({
            "norm1": _nrm_from(sd, base + ".norm1"),
            "qkv_w": _w_lin(sd, base + ".attn.qkv.weight"),
            "proj": {"w": _w_lin(sd, base + ".attn.proj.weight"),
                     "b": _v(sd, base + ".attn.proj.bias")},
            "norm2": _nrm_from(sd, base + ".norm2"),
            "fc1": {"w": _w_lin(sd, base + ".mlp.fc1.weight"),
                    "b": _v(sd, base + ".mlp.fc1.bias")},
            "fc2": {"w": _w_lin(sd, base + ".mlp.fc2.weight"),
                    "b": _v(sd, base + ".mlp.fc2.bias")},
        })
    return p
