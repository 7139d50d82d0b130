"""Fetch the benchmark datasets the driver's parity metrics are defined
on (BASELINE.md): TUM RGB-D fr1_desk and KITTI odometry 00 (grayscale).

The build environment has ZERO egress — this script degrades cleanly:
it reports which datasets are present, verifies layout (and checksums
when a manifest is present), and prints exact instructions when the
network is unavailable.  The moment the environment has connectivity
(or the datasets are mounted), `examples/run_tum_rgbd.py --ate` /
`examples/run_kitti_stereo.py` produce the parity numbers.

Usage:
  python scripts/fetch_datasets.py            # fetch/verify both
  python scripts/fetch_datasets.py tum        # just fr1_desk
  python scripts/fetch_datasets.py --root /data
"""
import argparse
import hashlib
import os
import sys
import tarfile
import urllib.request

DATASETS = {
    "tum": {
        "url": ("https://cvg.cit.tum.de/rgbd/dataset/freiburg1/"
                "rgbd_dataset_freiburg1_desk.tgz"),
        "dir": "rgbd_dataset_freiburg1_desk",
        "kind": "tgz",
        # sha256 of the upstream archive (stable since 2012)
        "sha256": None,   # filled on first successful fetch
        "check": ["rgb.txt", "depth.txt", "groundtruth.txt", "rgb",
                  "depth"],
    },
    "kitti": {
        "url": ("https://s3.eu-central-1.amazonaws.com/avg-kitti/"
                "data_odometry_gray.zip"),
        "dir": "kitti_odometry/sequences/00",
        "kind": "zip",
        "sha256": None,
        "check": ["image_0", "image_1", "times.txt"],
    },
}


def _sha256(path, chunk=1 << 20):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def verify(root: str, name: str) -> bool:
    spec = DATASETS[name]
    base = os.path.join(root, spec["dir"])
    missing = [c for c in spec["check"]
               if not os.path.exists(os.path.join(base, c))]
    if missing:
        return False
    print(f"[ok] {name}: {base} (complete)")
    return True


def fetch(root: str, name: str) -> bool:
    spec = DATASETS[name]
    if verify(root, name):
        return True
    os.makedirs(root, exist_ok=True)
    archive = os.path.join(root, os.path.basename(spec["url"]))
    if not os.path.exists(archive):
        print(f"[fetch] {spec['url']}")
        try:
            urllib.request.urlretrieve(spec["url"], archive + ".part")
            os.rename(archive + ".part", archive)
        except Exception as exc:          # no egress: degrade cleanly
            print(f"[offline] cannot download {name}: {exc}")
            print(f"  -> place the archive at {archive} or the "
                  f"extracted tree at {os.path.join(root, spec['dir'])}")
            return False
    if spec["sha256"] is not None:
        got = _sha256(archive)
        if got != spec["sha256"]:
            print(f"[error] checksum mismatch for {archive}: {got}")
            return False
    print(f"[extract] {archive}")
    if spec["kind"] == "tgz":
        with tarfile.open(archive) as tf:
            tf.extractall(root, filter="data")
    else:
        import zipfile
        with zipfile.ZipFile(archive) as zf:
            zf.extractall(os.path.join(root, "kitti_odometry"))
    return verify(root, name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=[],
                    help="datasets to fetch (default: all)")
    ap.add_argument("--root", default=os.environ.get(
        "AOS2_DATA", "/root/datasets"))
    args = ap.parse_args()
    names = args.names or list(DATASETS)
    ok = True
    for n in names:
        if n not in DATASETS:
            print(f"unknown dataset {n!r}; choices: {list(DATASETS)}")
            sys.exit(2)
        ok &= fetch(args.root, n)
    if not ok:
        print("\nruns once data is in place:")
        print("  python examples/run_tum_rgbd.py "
              f"{os.path.join(args.root, DATASETS['tum']['dir'])} --ate")
        print("  python examples/run_kitti_stereo.py "
              f"{os.path.join(args.root, DATASETS['kitti']['dir'])}")
        sys.exit(1)


if __name__ == "__main__":
    main()
