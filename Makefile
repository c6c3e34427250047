# Convenience targets. Tests run on an 8-device virtual CPU mesh; bench and
# train use the default accelerator (TPU when available).

.PHONY: test bench demo native clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

demo:
	python -m mswe_gnn_tpu.main train --config configs/demo_small.yaml --out runs/demo

native:
	$(MAKE) -C native

clean:
	$(MAKE) -C native clean
	rm -rf .jax_cache runs
