"""Batch ADM center-crop of ground-truth image folders.

Capability parity with `/root/reference/crop-gt.py`
(`center_crop_img_and_resize` :5-40): crop every image in a folder to
`--image-size` with the exact ADM crop and save alongside (or to --output).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from PIL import Image

from fast_dit_tpu.data import center_crop_arr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="folder of images")
    ap.add_argument("--output", default=None, help="output folder (default: <input>_cropped)")
    ap.add_argument("--image-size", type=int, default=256)
    args = ap.parse_args()

    out_dir = args.output or args.input.rstrip("/") + "_cropped"
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for fname in sorted(os.listdir(args.input)):
        if not fname.lower().endswith((".png", ".jpg", ".jpeg", ".webp", ".bmp")):
            continue
        img = Image.open(os.path.join(args.input, fname)).convert("RGB")
        center_crop_arr(img, args.image_size).save(os.path.join(out_dir, fname))
        n += 1
    print(f"cropped {n} images -> {out_dir}")


if __name__ == "__main__":
    main()
