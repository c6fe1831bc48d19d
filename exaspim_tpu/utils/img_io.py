"""Image IO: Zarr/N5/neuroglancer/TIFF readers, OME-Zarr writers,
coordinate transforms, patch access.

Capability parity with the reference's img_util IO surface (reference
img_util.py:33-397, 681-950) rebuilt on **tensorstore** (the one native
IO library in this image — it serves every chunked format the reference
needed five libraries for). Reads are lazy TensorStore views feeding the
host→HBM pipeline; writes produce Zarr v3 arrays with blosc-zstd codecs
and OME-NGFF multiscale metadata.

Defect fixed vs reference: the patch bounds check uses ``all`` (reference
img_util.py:296-297 used ``any``, accepting partially out-of-bounds
requests).
"""

from __future__ import annotations

import json
import os

import numpy as np

__all__ = [
    "JxlZarrArray",
    "read",
    "as_5d",
    "get_patch",
    "get_start_end",
    "get_ome_zarr_level_transform",
    "ome_zarr_coordinate_to_voxel",
    "write_zarr",
    "write_ome_zarr",
    "downsample_windowed_mean",
    "to_physical",
    "to_voxels",
    "local_to_physical",
]

_SHUFFLE_NAMES = {0: "noshuffle", 1: "shuffle", 2: "bitshuffle"}


def _kvstore(path):
    """tensorstore kvstore spec from a local path or cloud URL."""
    path = str(path)
    if path.startswith("gs://"):
        rest = path[5:]
        bucket, _, prefix = rest.partition("/")
        return {"driver": "gcs", "bucket": bucket, "path": prefix}
    if path.startswith("s3://"):
        rest = path[5:]
        bucket, _, prefix = rest.partition("/")
        return {
            "driver": "s3", "bucket": bucket, "path": prefix,
            "aws_credentials": {"anonymous": True},
        }
    return {"driver": "file", "path": os.path.abspath(path)}


def _open_ts(spec):
    import tensorstore as ts

    return ts.open(spec).result()


def read(path, dataset=None):
    """Open a volume lazily; dispatch on format (reference img_util.py:33-68).

    Returns a lazy TensorStore for chunked formats (slice to fetch) or a
    numpy array for TIFF. ``dataset`` selects a subgroup/level (e.g. "0"
    for the full-resolution OME-Zarr level).
    """
    p = str(path).rstrip("/")
    if dataset is not None:
        p = f"{p}/{dataset}"
    lower = p.lower()
    if lower.endswith((".tif", ".tiff")):
        return _read_tiff(p)
    if lower.endswith(".n5") or ".n5/" in lower:
        return _open_ts({"driver": "n5", "kvstore": _kvstore(p)})
    if _is_neuroglancer_precomputed(p) or "precomputed://" in p:
        vol = _open_ts({
            "driver": "neuroglancer_precomputed",
            "kvstore": _kvstore(p.replace("precomputed://", "")),
        })
        # Neuroglancer stores (x, y, z, channel); normalize to the
        # package's (z, y, x) lazy view (reference img_util.py:102-131
        # permutes the same way).
        return vol[..., 0].T
    # zarr: try v3 then v2.
    try:
        return _open_ts({"driver": "zarr3", "kvstore": _kvstore(p)})
    except Exception:
        try:
            return _open_ts({"driver": "zarr", "kvstore": _kvstore(p)})
        except Exception:
            # tensorstore has no JPEG-XL zarr codec; serve those
            # stores with the native libjxl-backed reader.
            arr = _maybe_jxl_zarr(p)
            if arr is None:
                raise
            return arr


def _is_neuroglancer_precomputed(path):
    """Cheap metadata probe (replaces the reference's CloudVolume
    format sniffing, reference img_util.py:102-131, 781): a store is
    precomputed iff it has an ``info`` file and no zarr metadata.
    Cloud (and any fsspec-resolvable) prefixes are probed the same way
    — one ``<prefix>/info`` existence check — so e.g. a GCS
    segmentation volume opens without a ``precomputed://`` hint."""
    if "://" in path:
        from exaspim_tpu.utils import cloud

        try:
            return cloud.exists(f"{path}/info") and not (
                cloud.exists(f"{path}/zarr.json")
                or cloud.exists(f"{path}/.zarray")
            )
        except Exception:
            return False  # unreachable/unknown scheme: explicit hints
    return os.path.exists(os.path.join(path, "info")) and not (
        os.path.exists(os.path.join(path, "zarr.json"))
        or os.path.exists(os.path.join(path, ".zarray"))
    )


# ------------------------------------------------- JPEG-XL-coded zarr v2

def _store_bytes(path):
    """Raw bytes at ``path`` (local or any fsspec URL); None if absent."""
    if "://" in path:
        from exaspim_tpu.utils.cloud import _fs

        fs, p, _ = _fs(path)
        if not fs.exists(p):
            return None
        with fs.open(p, "rb") as f:
            return f.read()
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return f.read()


def _maybe_jxl_zarr(path):
    """A lazy :class:`JxlZarrArray` when ``path`` is a zarr v2 array
    compressed with the ``imagecodecs_jpegxl`` numcodecs codec, else
    None. The reference reads such stores by registering imagecodecs'
    Jpegxl codec with zarr (reference img_util.py:170); tensorstore has
    no JPEG-XL codec, so this package serves them through its own
    libjxl binding (:mod:`exaspim_tpu.compression.jxl`)."""
    raw = _store_bytes(f"{path}/.zarray")
    if raw is None:
        return None
    meta = json.loads(raw)
    comp = meta.get("compressor") or {}
    if comp.get("id") != "imagecodecs_jpegxl":
        return None
    return JxlZarrArray(path, meta)


class JxlZarrArray:
    """Lazy zarr v2 array reader for ``imagecodecs_jpegxl``-compressed
    stores (grayscale uint8/uint16 chunks, C order, no filters — the
    layout the reference writes/reads via imagecodecs).

    Chunks decode through :func:`exaspim_tpu.compression.jxl.jxl_decode`
    (frame-per-leading-slice multiframe streams, matching
    ``imagecodecs.jpegxl_encode`` of an N-D chunk). Supports the same
    lazy protocol the package's readers expose: ``shape``/``dtype`` and
    basic ``__getitem__`` slicing returning numpy arrays.
    """

    def __init__(self, path, meta=None):
        self.path = str(path).rstrip("/")
        if meta is None:
            raw = _store_bytes(f"{self.path}/.zarray")
            if raw is None:
                raise FileNotFoundError(f"no .zarray under {path}")
            meta = json.loads(raw)
        if meta.get("zarr_format") != 2:
            raise ValueError("JxlZarrArray reads zarr v2 arrays only")
        if meta.get("filters"):
            raise ValueError("filters are not supported for jxl zarrs")
        if meta.get("order", "C") != "C":
            raise ValueError("only C-order jxl zarrs are supported")
        self.shape = tuple(int(s) for s in meta["shape"])
        self.chunks = tuple(int(c) for c in meta["chunks"])
        self.dtype = np.dtype(meta["dtype"])
        self.fill_value = meta.get("fill_value") or 0
        self._sep = meta.get("dimension_separator", ".")

    def __len__(self):
        return self.shape[0]

    @property
    def ndim(self):
        return len(self.shape)

    def _chunk(self, idx):
        """Decode chunk ``idx`` (grid coords), zero-padded at edges."""
        from exaspim_tpu.compression.jxl import jxl_decode

        raw = _store_bytes(
            f"{self.path}/{self._sep.join(str(i) for i in idx)}"
        )
        full = tuple(self.chunks)
        if raw is None:
            return np.full(full, self.fill_value, self.dtype)
        dec = jxl_decode(raw, dtype=self.dtype)
        return np.ascontiguousarray(dec).reshape(full)

    def __getitem__(self, key):
        if not isinstance(key, tuple):
            key = (key,)
        if any(k is Ellipsis for k in key):
            i = key.index(Ellipsis)
            key = (key[:i]
                   + (slice(None),) * (self.ndim - len(key) + 1)
                   + key[i + 1:])
        key = key + (slice(None),) * (self.ndim - len(key))
        squeeze, bounds = [], []
        for ax, k in enumerate(key):
            if isinstance(k, (int, np.integer)):
                k = int(k) + (self.shape[ax] if k < 0 else 0)
                if not 0 <= k < self.shape[ax]:
                    raise IndexError(
                        f"index {k} out of range on axis {ax}"
                    )
                squeeze.append(ax)
                bounds.append((k, k + 1))
            elif isinstance(k, slice):
                lo, hi, step = k.indices(self.shape[ax])
                if step != 1:
                    raise IndexError("strided reads are not supported")
                bounds.append((lo, max(lo, hi)))
            else:
                raise IndexError(f"unsupported index {k!r}")
        out = np.full(
            tuple(hi - lo for lo, hi in bounds),
            self.fill_value, self.dtype,
        )
        grids = [
            range(lo // c, max(lo // c + 1, -(-hi // c)))
            for (lo, hi), c in zip(bounds, self.chunks)
        ]
        import itertools

        for idx in itertools.product(*grids):
            chunk = self._chunk(idx)
            src, dst = [], []
            for ax, (g, c, (lo, hi)) in enumerate(
                zip(idx, self.chunks, bounds)
            ):
                c0 = g * c
                s_lo, s_hi = max(lo, c0), min(hi, c0 + c)
                if s_lo >= s_hi:
                    src = None
                    break
                src.append(slice(s_lo - c0, s_hi - c0))
                dst.append(slice(s_lo - lo, s_hi - lo))
            if src is not None:
                out[tuple(dst)] = chunk[tuple(src)]
        return out.reshape(tuple(
            s for ax, s in enumerate(out.shape) if ax not in squeeze
        ))


def _read_tiff(path):
    from PIL import Image

    img = Image.open(path)
    frames = []
    try:
        i = 0
        while True:
            img.seek(i)
            frames.append(np.asarray(img))
            i += 1
    except EOFError:
        pass
    arr = np.stack(frames) if len(frames) > 1 else frames[0]
    return arr


def as_5d(img):
    """Promote an array/TensorStore read to (t, c, z, y, x)."""
    arr = np.asarray(img)
    while arr.ndim < 5:
        arr = arr[np.newaxis]
    return arr


def get_start_end(voxel, shape, from_center=True):
    """Patch bounds around/from a voxel (reference img_util.py:308-331)."""
    if from_center:
        start = [v - s // 2 for v, s in zip(voxel, shape)]
    else:
        start = list(voxel)
    end = [s + d for s, d in zip(start, shape)]
    return start, end


def get_slices(voxel, shape, from_center=True):
    """Slice tuple for the patch around/from ``voxel`` (reference
    img_util.py:703)."""
    start, end = get_start_end(voxel, shape, from_center=from_center)
    return tuple(slice(s, e) for s, e in zip(start, end))


def get_patch(img, voxel, shape, from_center=True):
    """Read a 3D patch from a (lazy) 5D or 3D volume.

    Bounds are validated with ``all`` — every axis must be in range
    (fixes reference img_util.py:296-297).
    """
    start, end = get_start_end(voxel, shape, from_center=from_center)
    dims = img.shape[-3:]
    valid = all(
        s >= 0 and e <= d for s, e, d in zip(start, end, dims)
    )
    if not valid:
        raise ValueError(
            f"patch [{start}, {end}) out of bounds for volume {dims}"
        )
    sl = get_slices(voxel, shape, from_center=from_center)
    if len(img.shape) == 5:
        out = img[(0, 0) + sl]
    else:
        out = img[sl]
    return np.asarray(
        out.read().result() if hasattr(out, "read") else out
    )


# ------------------------------------------------------------ OME metadata

def _read_group_attrs(group_path):
    """OME attributes of a zarr group (v3 zarr.json or v2 .zattrs)."""
    if group_path.startswith(("gs://", "s3://")):
        from exaspim_tpu.utils.util import cloud_filesystem, parse_cloud_path

        fs = cloud_filesystem(group_path)
        _, bucket, prefix = parse_cloud_path(group_path)
        for name in ("zarr.json", ".zattrs"):
            key = f"{bucket}/{prefix}/{name}"
            if fs.exists(key):
                with fs.open(key) as f:
                    doc = json.load(f)
                return doc.get("attributes", doc)
        raise FileNotFoundError(f"no zarr metadata under {group_path}")
    for name in ("zarr.json", ".zattrs"):
        p = os.path.join(group_path, name)
        if os.path.exists(p):
            with open(p) as f:
                doc = json.load(f)
            return doc.get("attributes", doc)
    raise FileNotFoundError(f"no zarr metadata under {group_path}")


def get_ome_zarr_level_transform(img_path):
    """Scale/translation/unit for an OME-Zarr level array path
    (reference img_util.py:178-246).

    ``img_path`` points at a level array (e.g. ``…/image.ome.zarr/0``).
    """
    level_path = str(img_path).rstrip("/")
    if "/" not in level_path:
        raise ValueError(f"expected a Zarr level path, got {img_path!r}")
    group_path, dataset_path = level_path.rsplit("/", 1)
    attrs = _read_group_attrs(group_path)
    ome = attrs.get("ome", {})
    multiscales = attrs.get("multiscales") or ome.get("multiscales")
    if not multiscales:
        raise ValueError(f"no OME multiscales metadata at {group_path}")

    for ms in multiscales:
        dataset = next(
            (d for d in ms.get("datasets", [])
             if d.get("path") == dataset_path),
            None,
        )
        if dataset is None:
            continue
        axes = ms.get("axes", [])
        if [a.get("name") for a in axes] != ["t", "c", "z", "y", "x"]:
            raise ValueError(
                "expected OME-Zarr axes in (t, c, z, y, x) order"
            )
        units = {
            a.get("unit") for a in axes if a.get("type") == "space"
        }
        if len(units) != 1 or None in units:
            raise ValueError("expected one common spatial unit")
        scale = np.ones(5)
        translation = np.zeros(5)
        for tr in dataset.get("coordinateTransformations", []):
            if tr.get("type") == "scale":
                scale *= np.asarray(tr["scale"], float)
            elif tr.get("type") == "translation":
                translation += np.asarray(tr["translation"], float)
        return {
            "scale": tuple(scale.tolist()),
            "translation": tuple(translation.tolist()),
            "spatial_unit": units.pop(),
        }
    raise ValueError(
        f"dataset {dataset_path!r} not in OME metadata at {group_path}"
    )


def ome_zarr_coordinate_to_voxel(xyz, level_transform):
    """Neuroglancer (x, y, z) display coords → nearest (z, y, x) voxel
    (reference img_util.py:247-270)."""
    xyz = np.asarray(xyz, float)
    scale = np.asarray(level_transform["scale"], float)
    translation = np.asarray(level_transform["translation"], float)
    if xyz.shape != (3,):
        raise ValueError("xyz must contain exactly three coordinates")
    if scale.shape != (5,) or translation.shape != (5,):
        raise ValueError("scale/translation must each have five values")
    if np.any(scale[2:] == 0):
        raise ValueError("spatial scale values must be nonzero")
    zyx = xyz[::-1] - translation[2:] / scale[2:]
    return tuple(np.rint(zyx).astype(int).tolist())


# ---------------------------------------------------------------- writers

def downsample_windowed_mean(img, factors):
    """Non-overlapping windowed-mean downsample (trailing remainder
    trimmed), the pyramid rule the reference takes from
    xarray-multiscale's windowed mode (reference img_util.py:830-833)."""
    img = np.asarray(img)
    sl = tuple(
        slice(0, (s // f) * f) for s, f in zip(img.shape, factors)
    )
    img = img[sl]
    for ax, f in enumerate(factors):
        if f == 1:
            continue
        shape = img.shape
        new = shape[:ax] + (shape[ax] // f, f) + shape[ax + 1:]
        img = img.reshape(new).mean(axis=ax + 1)
    return img


def _zarr3_codecs(cname, clevel, shuffle, typesize):
    shuffle = _SHUFFLE_NAMES.get(shuffle, shuffle)
    return [
        {"name": "bytes", "configuration": {"endian": "little"}},
        {"name": "blosc", "configuration": {
            "cname": cname, "clevel": int(clevel), "shuffle": shuffle,
            "typesize": typesize,
        }},
    ]


def write_zarr(img, output_path, chunks=(1, 1, 64, 64, 64), cname="zstd",
               clevel=5, shuffle="shuffle"):
    """Write a 5D-promoted volume as one Zarr v3 array
    (reference img_util.py:898-950)."""
    img = as_5d(img)
    chunks = tuple(
        min(c, s) for c, s in zip(chunks, img.shape)
    )
    spec = {
        "driver": "zarr3",
        "kvstore": _kvstore(output_path),
        "metadata": {
            "shape": list(img.shape),
            "chunk_grid": {
                "name": "regular",
                "configuration": {"chunk_shape": list(chunks)},
            },
            "data_type": img.dtype.name,
            "codecs": _zarr3_codecs(
                cname, clevel, shuffle, img.dtype.itemsize
            ),
        },
        "create": True,
        "delete_existing": True,
    }
    arr = _open_ts(spec)
    arr[...] = img
    return output_path


def write_ome_zarr(img, output_path, chunks=(1, 1, 64, 128, 128),
                   n_levels=1, scale_factors=(1, 1, 2, 2, 2),
                   voxel_size=(748, 748, 1000), scale=None,
                   translation=None, spatial_unit="nanometer",
                   cname="zstd", clevel=5, shuffle="shuffle"):
    """Write an OME-NGFF multiscale Zarr v3 group
    (reference img_util.py:804-896).

    ``voxel_size`` is (x, y, z); an explicit ``scale``/``translation``
    uses stored (t, c, z, y, x) order. Each coarser level's translation
    shifts by half the increase in voxel size (voxel-center convention).
    """
    img = as_5d(img)
    base_scale = np.asarray(
        scale if scale is not None else [1, 1, *reversed(voxel_size)],
        float,
    )
    base_translation = np.asarray(
        translation if translation is not None else np.zeros(5), float
    )
    factors = np.asarray(scale_factors, float)
    for name, v in [("scale", base_scale),
                    ("translation", base_translation),
                    ("scale_factors", factors)]:
        if v.shape != (5,):
            raise ValueError(f"{name} must have five values (t,c,z,y,x)")

    pyramid = [img]
    for _ in range(1, n_levels):
        pyramid.append(
            downsample_windowed_mean(
                pyramid[-1], [int(f) for f in scale_factors]
            ).astype(img.dtype)
        )

    datasets = []
    for i, level in enumerate(pyramid):
        level_scale = base_scale * factors**i
        level_translation = base_translation + (level_scale - base_scale) / 2
        datasets.append({
            "path": str(i),
            "coordinateTransformations": [
                {"type": "scale", "scale": level_scale.tolist()},
                {"type": "translation",
                 "translation": level_translation.tolist()},
            ],
        })
        write_zarr(
            level, f"{str(output_path).rstrip('/')}/{i}", chunks=chunks,
            cname=cname, clevel=clevel, shuffle=shuffle,
        )

    attrs = {
        "ome": {
            "version": "0.5",
            "multiscales": [{
                "axes": [
                    {"name": "t", "type": "time", "unit": "millisecond"},
                    {"name": "c", "type": "channel"},
                    {"name": "z", "type": "space", "unit": spatial_unit},
                    {"name": "y", "type": "space", "unit": spatial_unit},
                    {"name": "x", "type": "space", "unit": spatial_unit},
                ],
                "datasets": datasets,
            }],
        }
    }
    _write_group_meta(output_path, attrs)
    return output_path


def _write_group_meta(path, attributes):
    doc = json.dumps({
        "zarr_format": 3, "node_type": "group",
        "attributes": attributes,
    }, indent=2)
    if str(path).startswith(("gs://", "s3://")):
        from exaspim_tpu.utils.util import cloud_filesystem, parse_cloud_path

        fs = cloud_filesystem(path)
        _, bucket, prefix = parse_cloud_path(str(path))
        with fs.open(f"{bucket}/{prefix}/zarr.json", "w") as f:
            f.write(doc)
    else:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "zarr.json"), "w") as f:
            f.write(doc)


# ------------------------------------------------------- coordinate utils

def to_physical(voxel, anisotropy):
    """(z, y, x) voxel → physical (x, y, z) coordinate
    (reference img_util.py:334-353)."""
    voxel = list(voxel)[::-1]
    return tuple(voxel[i] * anisotropy[i] for i in range(3))


def to_voxels(xyz, anisotropy):
    """Physical (x, y, z) → nearest (z, y, x) voxel
    (reference img_util.py:355-373)."""
    voxel = np.asarray(xyz, float) / np.asarray(anisotropy, float)
    return np.round(voxel).astype(int)[::-1]


def local_to_physical(local_voxel, offset, anisotropy):
    """Patch-local voxel + patch offset → physical coordinate
    (reference img_util.py:376-397)."""
    global_voxel = np.asarray(
        [v + o for v, o in zip(local_voxel, offset)]
    )
    return to_physical(global_voxel, anisotropy)
