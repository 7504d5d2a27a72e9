"""K4 BDBag-style packaging (make-crosscut-instance-bdbag.sh:139-148 in the
reference): a checksummed, reproducible archive of an exported dataset.

The reference shells out to bdbag; this is a dependency-free stdlib
implementation of the same observable artifact: a BagIt-shaped directory
(data/ payload, md5 + sha256 manifests, bagit.txt, bag-info.txt) packed
into a deterministic tar.gz (fixed mtimes/uids, sorted member order) so
repeated runs of the same payload are byte-identical — the property the
reference gets from its checksummed releases (SURVEY.md §5.5).

Scale note: this is a driver-side post-write step over files Spark already
wrote; the payload itself is produced distributed (write_tsv_dump /
write_documents) and only manifested here.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os
import tarfile


def _iter_payload(payload_dir: str):
    for root, dirs, files in os.walk(payload_dir):
        dirs.sort()  # fix traversal order — readdir order varies by filesystem
        for name in sorted(files):
            full = os.path.join(root, name)
            rel = os.path.relpath(full, payload_dir)
            yield rel, full


def make_bag(payload_dir: str, bag_path: str, bag_info: dict[str, str] | None = None) -> dict:
    """Package `payload_dir` as a deterministic BagIt tar.gz at `bag_path`.
    Returns a summary dict (n_files, payload_bytes, bag sha256)."""
    manifests = {"md5": [], "sha256": []}
    n_bytes = 0
    for rel, full in _iter_payload(payload_dir):
        h5, h256 = hashlib.md5(), hashlib.sha256()
        with open(full, "rb") as f:
            while chunk := f.read(1 << 20):
                h5.update(chunk)
                h256.update(chunk)
                n_bytes += len(chunk)
        manifests["md5"].append(f"{h5.hexdigest()}  data/{rel}")
        manifests["sha256"].append(f"{h256.hexdigest()}  data/{rel}")

    meta = {
        "bagit.txt": "BagIt-Version: 0.97\nTag-File-Character-Encoding: UTF-8\n",
        "bag-info.txt": "".join(
            f"{k}: {v}\n" for k, v in sorted((bag_info or {}).items())
        ),
        "manifest-md5.txt": "\n".join(manifests["md5"]) + "\n",
        "manifest-sha256.txt": "\n".join(manifests["sha256"]) + "\n",
    }

    def add_bytes(tar: tarfile.TarFile, name: str, data: bytes) -> None:
        info = tarfile.TarInfo(name)
        info.size = len(data)
        info.mtime = 0
        info.uid = info.gid = 0
        info.uname = info.gname = ""
        tar.addfile(info, io.BytesIO(data))

    # gzip with mtime=0, no FNAME header (filename='' — otherwise the
    # output path leaks into the header), and sorted tar members ==
    # byte-reproducible archive.
    with open(bag_path, "wb") as raw:
        with gzip.GzipFile(filename="", fileobj=raw, mode="wb", mtime=0) as gz:
            with tarfile.open(fileobj=gz, mode="w") as tar:
                for name in sorted(meta):
                    add_bytes(tar, f"bag/{name}", meta[name].encode())
                for rel, full in _iter_payload(payload_dir):
                    with open(full, "rb") as f:
                        add_bytes(tar, f"bag/data/{rel}", f.read())

    with open(bag_path, "rb") as f:
        bag_sha = hashlib.sha256(f.read()).hexdigest()
    return {
        "n_files": len(manifests["md5"]),
        "payload_bytes": n_bytes,
        "bag_sha256": bag_sha,
    }


def verify_bag(bag_path: str) -> bool:
    """Re-check every payload checksum inside a bag archive."""
    with tarfile.open(bag_path, "r:gz") as tar:
        manifest = tar.extractfile("bag/manifest-sha256.txt").read().decode()
        expected = {}
        for line in manifest.strip().splitlines():
            digest, name = line.split("  ", 1)
            expected[f"bag/{name}"] = digest
        for name, digest in expected.items():
            data = tar.extractfile(name).read()
            if hashlib.sha256(data).hexdigest() != digest:
                return False
    return True
