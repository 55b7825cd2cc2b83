# Convenience targets (see CLAUDE.md for environment notes)

.PHONY: test bench bench-all native figures dryrun docs

docs:
	python docs/gen_api.py

test:
	python -m pytest tests/ -q

bench:
	python bench.py

bench-all:
	python bench.py
	python bench.py --config blr
	python bench.py --config hier
	python bench_scaling.py

native:
	$(MAKE) -C native

figures:
	python examples/plot_results.py

dryrun:
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
