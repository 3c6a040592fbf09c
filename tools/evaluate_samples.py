"""Evaluate generated samples: FID/KID/IS from ADM-style npz or folders,
plus paired PSNR/SSIM/LPIPS/TSED for NVS outputs.

Capability parity with `/root/reference/evaluation-metrics.py` as a CLI over
`fast_dit_tpu.nvs.metrics`. The Inception feature extractor is injected: with
TensorFlow + downloaded weights available it uses keras InceptionV3 (pool
features for FID/KID, logits for IS); otherwise FID-family metrics are
skipped with a clear message (offline environments).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_images(path, limit=None):
    """npz (arr_0) or folder of images -> (N, H, W, 3) uint8."""
    if path.endswith(".npz"):
        arr = np.load(path)["arr_0"]
        return arr[:limit] if limit else arr
    from PIL import Image

    files = sorted(f for f in os.listdir(path)
                   if f.lower().endswith((".png", ".jpg", ".jpeg")))
    if limit:
        files = files[:limit]
    return np.stack([np.asarray(Image.open(os.path.join(path, f)).convert("RGB"))
                     for f in files])


def make_random_projection_fns(feature_dim=64, n_classes=100, seed=0):
    """Deterministic offline stand-in for InceptionV3: 4x4-average-pooled
    pixels through a fixed Gaussian projection (features for FID/KID) and a
    second projection + softmax (class probabilities for IS). Not a trained
    net — useful for exercising and regression-testing the full FID/KID/IS
    pipeline end-to-end where no weights can be downloaded."""

    def pooled(imgs):
        x = imgs.astype(np.float64) / 127.5 - 1.0
        n, h, w, c = x.shape
        ph, pw = max(h // 8, 1), max(w // 8, 1)
        x = x[:, : (h // ph) * ph, : (w // pw) * pw]
        x = x.reshape(n, h // ph, ph, w // pw, pw, c).mean((2, 4))
        return x.reshape(n, -1)

    # FID/KID/IS compare statistics in ONE feature space: every call must
    # project through the same matrix. The projection is pinned to the
    # first batch's pooled dim; mixing resolutions would silently compare
    # unrelated spaces, so reject it loudly instead.
    w_feat = w_cls = None

    def _check_dim(w, x):
        if w.shape[0] != x.shape[1]:
            raise ValueError(
                f"image sets have different pooled feature dims "
                f"({w.shape[0]} vs {x.shape[1]}): reference and generated "
                f"sets must share one resolution for random-projection "
                f"FID/KID/IS to be meaningful")

    def feature_fn(imgs):
        nonlocal w_feat
        x = pooled(imgs)
        if w_feat is None:
            w_feat = np.random.RandomState(seed).randn(
                x.shape[1], feature_dim) / np.sqrt(x.shape[1])
        _check_dim(w_feat, x)
        return np.tanh(x @ w_feat)

    def logits_fn(imgs):
        nonlocal w_cls
        x = pooled(imgs)
        if w_cls is None:
            w_cls = np.random.RandomState(seed + 1).randn(
                x.shape[1], n_classes) / np.sqrt(x.shape[1])
        _check_dim(w_cls, x)
        z = x @ w_cls
        e = np.exp(z - z.max(1, keepdims=True))
        return e / e.sum(1, keepdims=True)

    return feature_fn, logits_fn


def make_inception_fns():
    """(feature_fn, logits_fn) via keras InceptionV3, or (None, None)."""
    try:
        import tensorflow as tf

        model = tf.keras.applications.InceptionV3(
            include_top=True, weights="imagenet")
        feat_model = tf.keras.Model(model.input,
                                    model.get_layer("avg_pool").output)

        def prep(imgs):
            x = tf.image.resize(imgs.astype(np.float32), (299, 299))
            return tf.keras.applications.inception_v3.preprocess_input(x)

        def feature_fn(imgs):
            return feat_model.predict(prep(imgs), verbose=0, batch_size=64)

        def logits_fn(imgs):
            return model.predict(prep(imgs), verbose=0, batch_size=64)

        return feature_fn, logits_fn
    except Exception as e:  # offline / no TF weights
        print(f"# InceptionV3 unavailable ({type(e).__name__}); "
              "skipping FID/KID/IS", file=sys.stderr)
        return None, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--generated", required=True, help="npz or folder")
    ap.add_argument("--reference", default=None, help="npz or folder (for FID/KID)")
    ap.add_argument("--paired", action="store_true",
                    help="treat generated/reference as aligned pairs "
                         "(PSNR/SSIM/LPIPS)")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--tsed-poses", default=None,
                    help="npz with F matrices (key arr_0, one per adjacent "
                         "pair) for TSED consistency")
    ap.add_argument("--feature-net", default="inception",
                    choices=["inception", "random"],
                    help="'random' = fixed-seed projection features (offline "
                         "FID/KID/IS pipeline exercise; not a trained net)")
    args = ap.parse_args()

    from fast_dit_tpu.nvs import metrics

    gen = load_images(args.generated, args.limit)
    print(f"generated: {gen.shape}")
    results = {}

    if args.reference:
        ref = load_images(args.reference, args.limit)
        if args.paired:
            n = min(len(gen), len(ref))
            results["psnr"] = float(np.mean(
                [metrics.psnr(ref[i], gen[i]) for i in range(n)]))
            results["ssim"] = float(np.mean(
                [metrics.ssim(ref[i], gen[i]) for i in range(n)]))
            try:
                a = (gen[:n].transpose(0, 3, 1, 2) / 127.5 - 1).astype(np.float32)
                b = (ref[:n].transpose(0, 3, 1, 2) / 127.5 - 1).astype(np.float32)
                results["lpips"] = metrics.compute_lpips(a, b)
            except ImportError:
                print("# lpips package unavailable; skipping LPIPS", file=sys.stderr)
        feature_fn, logits_fn = (make_random_projection_fns()
                                 if args.feature_net == "random"
                                 else make_inception_fns())
        if feature_fn is not None:
            results["fid"] = metrics.compute_fid(ref, gen, feature_fn)
            kid_mean, kid_std = metrics.compute_kid(ref, gen, feature_fn)
            results["kid"] = kid_mean
            probs_raw = logits_fn(gen)
            probs = probs_raw / probs_raw.sum(axis=1, keepdims=True)
            is_mean, is_std = metrics.inception_score(np.clip(probs, 1e-12, 1))
            results["inception_score"] = is_mean

    if args.tsed_poses:
        Fs = np.load(args.tsed_poses)["arr_0"]
        scores = []
        for i in range(min(len(gen) - 1, len(Fs))):
            s = metrics.compute_tsed(gen[i], gen[i + 1], Fs[i])
            if s is not None:
                scores.append(s)
        if scores:
            results["tsed"] = float(np.mean(scores))

    for k, v in results.items():
        print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
