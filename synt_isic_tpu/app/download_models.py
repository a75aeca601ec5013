"""Checkpoint downloader: fetch pretrained per-class UNets + classifier.

Parity with reference `download_models.py` (:15-112): Google-Drive fetch by
file id with the confirm-token dance, zip extraction into `checkpoints/`,
and a listing helper. Network access is gated — environments without
`requests`/egress get a clear message instead of a crash.
"""
from __future__ import annotations

import zipfile
from pathlib import Path
from typing import Dict, Optional

# File ids are deployment-specific; fill in for your mirror of the
# reference checkpoints (the reference hardcodes its own Drive ids).
DRIVE_FILES: Dict[str, str] = {
    # "checkpoints.zip": "<google-drive-file-id>",
}

CHUNK = 1 << 15


def download_from_google_drive(file_id: str, dest: Path) -> bool:
    try:
        import requests
    except ImportError:
        print("requests not available — cannot download")
        return False
    url = "https://docs.google.com/uc?export=download"
    session = requests.Session()
    response = session.get(url, params={"id": file_id}, stream=True)
    token = next((v for k, v in response.cookies.items()
                  if k.startswith("download_warning")), None)
    if token:
        response = session.get(url, params={"id": file_id, "confirm": token},
                               stream=True)
    with open(dest, "wb") as f:
        for chunk in response.iter_content(CHUNK):
            if chunk:
                f.write(chunk)
    return dest.exists() and dest.stat().st_size > 0


def extract_checkpoints(zip_path: Path, checkpoints_dir: Path) -> None:
    checkpoints_dir.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(checkpoints_dir)


def list_checkpoints(checkpoints_dir: Path) -> None:
    if not checkpoints_dir.exists():
        print(f"no checkpoints dir at {checkpoints_dir}")
        return
    for p in sorted(checkpoints_dir.glob("*.pth")):
        print(f"  {p.name}  {p.stat().st_size / 1e6:.1f} MB")


def main(checkpoints_dir: Optional[str] = None) -> int:
    ckpt = Path(checkpoints_dir or "checkpoints")
    if not DRIVE_FILES:
        print("no download sources configured (DRIVE_FILES empty); "
              "place unet_<CLASS>_best.pth files into", ckpt)
        list_checkpoints(ckpt)
        return 0
    for name, file_id in DRIVE_FILES.items():
        dest = ckpt / name
        print(f"downloading {name} ...")
        if download_from_google_drive(file_id, dest):
            if name.endswith(".zip"):
                extract_checkpoints(dest, ckpt)
                dest.unlink()
        else:
            print(f"failed: {name}")
    list_checkpoints(ckpt)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
