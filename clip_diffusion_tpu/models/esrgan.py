"""Real-ESRGAN super-resolution (RRDBNet) in Flax.

The reference upsamples every latent-diffusion output x4 with
`RealESRGANer` over an `RRDBNet(3, 3, 64, 23, 32, scale)` (reference
models.py:153-174, image_utils.py:133-155).  Reimplemented: 23
Residual-in-Residual Dense Blocks (3 residual dense blocks each, 5 convs
with dense connections, LeakyReLU 0.2, residual scaling 0.2), nearest x2
upsampling stages, and the x2 variant's space-to-depth input packing.

Input/output: NHWC in [0,1].
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax.numpy as jnp


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.2)


def _nearest_up2(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def _space_to_depth(x, factor: int):
    b, h, w, c = x.shape
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, h // factor, w // factor, c * factor * factor
    )


class ResidualDenseBlock(nn.Module):
    num_feat: int = 64
    num_grow_ch: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = self.num_grow_ch
        c1 = _lrelu(nn.Conv(g, (3, 3), padding=1, dtype=self.dtype,
                            name="conv1")(x))
        c2 = _lrelu(nn.Conv(g, (3, 3), padding=1, dtype=self.dtype,
                            name="conv2")(jnp.concatenate([x, c1], -1)))
        c3 = _lrelu(nn.Conv(g, (3, 3), padding=1, dtype=self.dtype,
                            name="conv3")(jnp.concatenate([x, c1, c2], -1)))
        c4 = _lrelu(nn.Conv(g, (3, 3), padding=1, dtype=self.dtype,
                            name="conv4")(jnp.concatenate([x, c1, c2, c3], -1)))
        c5 = nn.Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                     name="conv5")(jnp.concatenate([x, c1, c2, c3, c4], -1))
        return x + 0.2 * c5


class RRDB(nn.Module):
    num_feat: int = 64
    num_grow_ch: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch, self.dtype,
                                 name="rdb1")(x)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch, self.dtype,
                                 name="rdb2")(out)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch, self.dtype,
                                 name="rdb3")(out)
        return x + 0.2 * out


class RRDBNet(nn.Module):
    """RRDBNet(num_in_ch=3, num_out_ch=3, num_feat=64, num_block=23,
    num_grow_ch=32, scale in {2, 4})."""

    num_out_ch: int = 3
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32
    scale: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.scale == 2:
            x = _space_to_depth(x, 2)
        feat = nn.Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_first")(x)
        body = feat
        block = nn.remat(RRDB) if self.num_block > 8 else RRDB
        for i in range(self.num_block):
            body = block(self.num_feat, self.num_grow_ch, self.dtype,
                         name=f"body_{i}")(body)
        body = nn.Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_body")(body)
        feat = feat + body
        feat = _lrelu(nn.Conv(self.num_feat, (3, 3), padding=1,
                              dtype=self.dtype, name="conv_up1")(
            _nearest_up2(feat)))
        feat = _lrelu(nn.Conv(self.num_feat, (3, 3), padding=1,
                              dtype=self.dtype, name="conv_up2")(
            _nearest_up2(feat)))
        feat = _lrelu(nn.Conv(self.num_feat, (3, 3), padding=1,
                              dtype=self.dtype, name="conv_hr")(feat))
        return nn.Conv(self.num_out_ch, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_last")(feat)


def convert_rrdbnet(state_dict) -> dict:
    """basicsr RRDBNet torch state dict -> flax params."""
    from clip_diffusion_tpu.models.convert import _np, _set, conv_kernel

    params: dict = {}
    for key, val in state_dict.items():
        parts = key.split(".")
        leaf = parts[-1]
        arr = conv_kernel(val) if leaf == "weight" else _np(val)
        name = "kernel" if leaf == "weight" else "bias"
        if parts[0] == "body":
            # body.N.rdbM.convK.weight
            _set(params, (f"body_{parts[1]}", parts[2], parts[3], name), arr)
        else:
            _set(params, (parts[0], name), arr)
    return {"params": params}


def super_resolution_folder(model: RRDBNet, params, folder: str,
                            exception_paths=(), tile: int = 0):
    """Upscale every PNG in `folder` except `exception_paths`, writing to
    <folder>/sr/ (reference image_utils.py:133-155 semantics)."""
    import os

    import numpy as np

    from clip_diffusion_tpu.utils.dirs import list_images, make_dir
    from clip_diffusion_tpu.utils.image_io import array_to_image, load_image

    out_dir = make_dir(os.path.join(folder, "sr"))
    skip = {os.path.abspath(p) for p in exception_paths}
    written = []
    for path in list_images(folder):
        if os.path.abspath(path) in skip:
            continue
        img = load_image(path)[None]
        up = np.asarray(upscale(model, params, img, tile=tile))[0]
        dest = os.path.join(out_dir, os.path.basename(path))
        array_to_image(up).save(dest)
        written.append(dest)
    return written


@functools.lru_cache(maxsize=None)
def _jit_enhance(model: RRDBNet):
    # flax Modules are frozen dataclasses (hashable); jit once per model so
    # the eager serving path runs ONE program instead of per-op dispatches
    # (hundreds of round-trips on remote-attached backends)
    import jax

    return jax.jit(
        lambda p, x: jnp.clip(model.apply(p, x), 0.0, 1.0)
    )


def upscale(model: RRDBNet, params, images01, tile: int = 0):
    """RealESRGANer.enhance equivalent: NHWC [0,1] -> upscaled [0,1].

    `tile`: optional tiled inference size for large inputs (0 = whole
    image); tiles overlap by 16 px and are blended by cropping, matching
    RealESRGANer's tile mode semantics."""
    import jax

    if tile <= 0:
        return _jit_enhance(model)(params, images01)

    pad = 16
    b, h, w, c = images01.shape
    s = model.scale
    out = jnp.zeros((b, h * s, w * s, model.num_out_ch), images01.dtype)
    for y0 in range(0, h, tile):
        for x0 in range(0, w, tile):
            y1, x1 = min(y0 + tile, h), min(x0 + tile, w)
            ys, xs = max(y0 - pad, 0), max(x0 - pad, 0)
            ye, xe = min(y1 + pad, h), min(x1 + pad, w)
            patch = images01[:, ys:ye, xs:xe]
            # one compiled program per distinct patch shape (interior tiles
            # share one); clip-before-crop == crop-before-clip elementwise
            up = _jit_enhance(model)(params, patch)
            crop = up[
                :, (y0 - ys) * s : (y1 - ys) * s, (x0 - xs) * s : (x1 - xs) * s
            ]
            out = out.at[:, y0 * s : y1 * s, x0 * s : x1 * s].set(crop)
    return jnp.clip(out, 0.0, 1.0)
