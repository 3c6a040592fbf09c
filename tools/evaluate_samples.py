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
        feature_fn, logits_fn = make_inception_fns()
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
