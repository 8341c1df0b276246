# Developer entry points.  Everything is plain python; no build step except
# the optional native tier.

.PHONY: test native data bench tpu-checks clean

test:
	python -m pytest tests/ -q

native:
	sh scripts/build_native.sh

data:
	python scripts/prepare_data.py --synthetic --dataset lyrics --out data/lyrics
	python scripts/prepare_data.py --synthetic --dataset midi   --out data/midi

bench:
	python bench.py

tpu-checks:
	python scripts/tpu_checks.py

clean:
	rm -rf .jax_cache native/libfastdata.so __pycache__ */__pycache__
