"""Decompose the host-side input-pipeline cost per sample (1-core host)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from ecs_yolo_tpu.data.dataset import Dataset

root = Path(sys.argv[1]) if len(sys.argv) > 1 else None
ds = Dataset(str(root), img_size=640, augment=False, max_labels=16,
             cache_images="ram", uint8_out=True)
# fill cache
t0 = time.perf_counter()
for i in range(64): ds.load_image(i)
t1 = time.perf_counter()
print(f"decode+fill: {(t1-t0)/64*1000:.1f} ms/img")
# cached getitem (letterbox path)
t0 = time.perf_counter()
for i in range(64): ds[i]
t1 = time.perf_counter()
print(f"cached getitem (letterbox+pad): {(t1-t0)/64*1000:.1f} ms/img")
# collate 4 batches of 16
t0 = time.perf_counter()
for b in range(4):
    items = [ds[i] for i in range(b*16,(b+1)*16)]
    ims = np.stack([x[0] for x in items])
t1 = time.perf_counter()
print(f"getitem+stack: {(t1-t0)/64*1000:.1f} ms/img")
