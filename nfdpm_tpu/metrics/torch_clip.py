"""Pure-torch CLIP ViT-B/32 visual tower (validation oracle — no `clip` pkg).

From-scratch torch mirror of OpenAI CLIP's VisionTransformer (patch 32,
width 768, 12 layers/heads, 512-d projection, pre-LN, quick-GELU), the
feature model clean-fid uses for model_name="clip_vit_b_32" (reference
integration /root/reference/metrics/compute.py:117-127). Module attribute
names replicate OpenAI CLIP's, so the `visual.*` half of a real ViT-B-32
state dict loads directly — `tools/validate_fid_weights.py` can then
cross-check the JAX extractor (metrics/clip_features.py) with only torch
installed (VERDICT r2 item 9). Offline, the same graph under random weights
is the executable oracle for the importer's qkv in_proj/out_proj transposes
(tests/test_weight_importers.py).

Validation-only; the production feature path is the JAX one.
"""

from __future__ import annotations

import numpy as np

from .clip_features import CLIP_MEAN, CLIP_STD


def build_visual_model(patch=32, width=768, layers=12, heads=12, out_dim=512,
                       image_size=224):
    """CLIP visual tower, plain torch; state_dict keys match CLIP.visual."""
    import torch
    import torch.nn as nn

    class QuickGELU(nn.Module):
        def forward(self, x):
            return x * torch.sigmoid(1.702 * x)

    class ResidualAttentionBlock(nn.Module):
        def __init__(self):
            super().__init__()
            self.attn = nn.MultiheadAttention(width, heads)
            self.ln_1 = nn.LayerNorm(width)
            self.mlp = nn.Sequential()
            self.mlp.add_module("c_fc", nn.Linear(width, width * 4))
            self.mlp.add_module("gelu", QuickGELU())
            self.mlp.add_module("c_proj", nn.Linear(width * 4, width))
            self.ln_2 = nn.LayerNorm(width)

        def forward(self, x):  # x: [L, N, D]
            h = self.ln_1(x)
            x = x + self.attn(h, h, h, need_weights=False)[0]
            return x + self.mlp(self.ln_2(x))

    class Transformer(nn.Module):
        def __init__(self):
            super().__init__()
            self.resblocks = nn.Sequential(
                *[ResidualAttentionBlock() for _ in range(layers)])

        def forward(self, x):
            return self.resblocks(x)

    class VisionTransformer(nn.Module):
        def __init__(self):
            super().__init__()
            scale = width ** -0.5
            self.conv1 = nn.Conv2d(3, width, kernel_size=patch, stride=patch,
                                   bias=False)
            self.class_embedding = nn.Parameter(scale * torch.randn(width))
            n_tok = (image_size // patch) ** 2 + 1
            self.positional_embedding = nn.Parameter(
                scale * torch.randn(n_tok, width))
            self.ln_pre = nn.LayerNorm(width)
            self.transformer = Transformer()
            self.ln_post = nn.LayerNorm(width)
            self.proj = nn.Parameter(scale * torch.randn(width, out_dim))

        def forward(self, x):  # [B, 3, H, W] normalized
            x = self.conv1(x)
            b = x.shape[0]
            x = x.reshape(b, width, -1).permute(0, 2, 1)  # [B, grid, D]
            cls = self.class_embedding.to(x.dtype).expand(b, 1, width)
            x = torch.cat([cls, x], dim=1) + self.positional_embedding
            x = self.ln_pre(x).permute(1, 0, 2)  # NLD -> LND
            x = self.transformer(x).permute(1, 0, 2)
            x = self.ln_post(x[:, 0, :])
            return x @ self.proj

    model = VisionTransformer()
    model.eval()
    return model


def load_weights(model, path):
    """Load the `visual.*` half of an OpenAI CLIP checkpoint (jit archive or
    plain state dict) into the visual model; text-tower keys are dropped."""
    import torch

    obj = torch.load(path, map_location="cpu")
    sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
    visual = {k[len("visual."):]: v.float() for k, v in sd.items()
              if k.startswith("visual.")}
    missing, unexpected = model.load_state_dict(visual, strict=False)
    if missing or unexpected:
        raise ValueError(f"state-dict mismatch: missing={list(missing)[:5]} "
                         f"unexpected={list(unexpected)[:5]}")
    return model


def features_u8(model, imgs_u8):
    """uint8 [B, 224, 224, 3] -> L2-normalized [B, 512] np.float32 — the
    same contract as clip_features.make_feature_fn (CLIP normalization)."""
    import torch

    with torch.no_grad():
        x = torch.from_numpy(imgs_u8.transpose(0, 3, 1, 2)).float() / 255.0
        mean = torch.tensor(CLIP_MEAN).view(1, 3, 1, 1)
        std = torch.tensor(CLIP_STD).view(1, 3, 1, 1)
        f = model((x - mean) / std)
        return (f / f.norm(dim=-1, keepdim=True)).numpy().astype(np.float32)
