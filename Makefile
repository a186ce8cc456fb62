.PHONY: test native bench clean

test:
	python -m pytest tests/ -q

native:
	g++ -O3 -march=native -shared -fPIC -fopenmp \
		-o native/libatvsnet_native.so native/atvsnet_native.cpp

bench:
	python bench.py

clean:
	rm -f native/libatvsnet_native.so
	find . -name __pycache__ -type d -exec rm -rf {} +
