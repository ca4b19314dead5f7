"""COCO instances json -> darknet label txts + image list.

Used by scripts/get_coco2014.sh / get_coco2017.sh. Fresh implementation of
the label-pack step the reference outsources to a gdrive download
(/root/reference/data/get_coco2017.sh): for every image, writes
``labels/<split>/<stem>.txt`` with one ``cls cx cy w h`` row per annotation
(normalized, 80-class contiguous ids), plus a newline-separated image list.
The loader maps images->labels by replacing ``images`` with ``labels`` in
the path (yolo_tpu/data/datasets.py:237), so the layout here must keep
images under ``<out>/images/<split>/``.
"""
import argparse
import json
import os


def coco80_map(categories):
    """COCO category ids (1..90, sparse) -> contiguous 0..79 darknet ids."""
    ids = sorted(c['id'] for c in categories)
    return {cid: i for i, cid in enumerate(ids)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ann', required=True, help='instances_*.json')
    ap.add_argument('--images', required=True, help='dir holding the jpgs')
    ap.add_argument('--out', required=True, help='dataset root (labels/ created here)')
    ap.add_argument('--list', required=True, help='image list txt to write')
    args = ap.parse_args()

    with open(args.ann) as f:
        coco = json.load(f)
    cat = coco80_map(coco['categories'])
    split = os.path.basename(args.images.rstrip('/'))
    lab_dir = os.path.join(args.out, 'labels', split)
    os.makedirs(lab_dir, exist_ok=True)

    imgs = {im['id']: im for im in coco['images']}
    rows = {}  # image id -> list of label lines
    for a in coco.get('annotations', []):
        if a.get('iscrowd'):
            continue
        im = imgs.get(a['image_id'])
        if im is None:
            continue
        x, y, w, h = a['bbox']  # top-left xywh in pixels
        iw, ih = float(im['width']), float(im['height'])
        # clip to the image, then convert to normalized center form
        x2, y2 = min(x + w, iw), min(y + h, ih)
        x, y = max(x, 0.0), max(y, 0.0)
        bw, bh = x2 - x, y2 - y
        if bw <= 1 or bh <= 1:
            continue
        cx, cy = (x + bw / 2) / iw, (y + bh / 2) / ih
        rows.setdefault(a['image_id'], []).append(
            f"{cat[a['category_id']]} {cx:.6f} {cy:.6f} {bw / iw:.6f} {bh / ih:.6f}")

    listed = []
    for iid, im in imgs.items():
        img_path = os.path.join(args.images, im['file_name'])
        if not os.path.isfile(img_path):
            continue
        lines = rows.get(iid)
        if lines:  # empty-label images get no txt (loader treats as background)
            stem = os.path.splitext(im['file_name'])[0]
            with open(os.path.join(lab_dir, stem + '.txt'), 'w') as f:
                f.write('\n'.join(lines) + '\n')
        listed.append(os.path.abspath(img_path))

    with open(args.list, 'w') as f:
        f.write('\n'.join(sorted(listed)) + '\n')
    print(f'{os.path.basename(args.ann)}: {len(listed)} images, '
          f'{sum(len(v) for v in rows.values())} boxes -> {args.list}')


if __name__ == '__main__':
    main()
