"""Drive the reference's shipped demo workload end-to-end on a real photo.

The reference's primary deliverable is `gen_videos.sh` over real photographs
in `/root/reference/samples/*.jpg` (`gen_videos.py:112-119` reads them with
cv2.imread). This demo pushes one of those photos through the full
framework pipeline:

    native imread -> (optional FFHQ alignment from 68-pt landmarks)
        -> E (ResNeXt50) -> G.mapping -> pose orbit -> render+SR -> video

Usage (random weights unless --network points at a converted checkpoint —
the released G-NeRF pkl is not staged in this environment, see BASELINE.md):

    python tools/demo_real_photo.py                         # sample photo
    python tools/demo_real_photo.py --photo me.jpg --lm me_landmarks.json
    python tools/demo_real_photo.py --network ckpt.npz --frames 120

With --lm the photo is FFHQ-aligned before encoding (the landmark file is
[[x,y]*68] json / .npy / whitespace text in source pixel coords).
"""

import json
import os
import shutil
import sys
import tempfile

import click

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_PHOTO = "/root/reference/samples/66667.jpg"


@click.command()
@click.option("--photo", default=DEFAULT_PHOTO, show_default=True,
              help="Input photograph (any size; decoded natively)")
@click.option("--lm", default="",
              help="68-pt landmark file for FFHQ alignment (json/npy/txt)")
@click.option("--network", default=None,
              help="Checkpoint .npz (default: deterministic random init)")
@click.option("--frames", type=int, default=3, show_default=True)
@click.option("--res", type=int, default=64, show_default=True,
              help="Neural render resolution")
@click.option("--out", default="demo_results/", show_default=True)
@click.option("--seed", type=int, default=0, show_default=True)
@click.option("--fp32", is_flag=True, default=False)
def main(photo, lm, network, frames, res, out, seed, fp32):
    assert os.path.isfile(photo), f"photo not found: {photo}"
    from gnerf_tpu.infer.gen_videos import generate_videos

    align_dir = ""
    tmp = None
    if lm:
        # gen_videos' --align_lm contract is a folder keyed by photo stem.
        tmp = tempfile.mkdtemp(prefix="demo_lm_")
        stem = os.path.splitext(os.path.basename(photo))[0]
        ext = os.path.splitext(lm)[1] or ".json"
        if ext == ".json" and not lm.endswith(".json"):
            with open(lm) as f:
                payload = json.load(f)
            with open(os.path.join(tmp, stem + ".json"), "w") as f:
                json.dump(payload, f)
        else:
            shutil.copy(lm, os.path.join(tmp, stem + ext))
        align_dir = tmp

    try:
        generate_videos(
            network=network, id_image=photo, video_out_path=out, outdir=out,
            res=res, frames=frames, fp32=fp32, align_lm=align_dir,
            seed_init=None if network else seed,
        )
    finally:
        if tmp:
            shutil.rmtree(tmp, ignore_errors=True)
    print(f"demo outputs in {out}")


if __name__ == "__main__":
    main()
