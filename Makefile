# Build / test / bench entry points (the CMake+CTest analog of the
# reference's top-level build, CMakeLists.txt:146-187).

CXX ?= g++
CXXFLAGS ?= -O3 -std=c++17 -shared -fPIC -pthread -fno-exceptions
NATIVE_LIB = rocjpeg_tpu/runtime/librocjpeg_host.so

# C ABI library (the librocjpeg.so analog: 9 extern "C" entry points backed
# by an embedded CPython runtime) + the C sample that exercises it.
PY_EMBED_CFLAGS := $(shell python3-config --includes)
PY_EMBED_LDFLAGS := $(shell python3-config --ldflags --embed)
CAPI_LIB = build/librocjpeg_tpu.so
CAPI_SAMPLE = build/jpegdecode_c
CAPI_PERF = build/jpegdecodeperf_c

.PHONY: all native capi test test-fast bench clean

all: native capi

native: $(NATIVE_LIB)

$(NATIVE_LIB): csrc/rocjpeg_entropy.cpp
	$(CXX) $(CXXFLAGS) $< -o $@

# ASAN variant of the native host library (the reference's rocjpeg-asan
# package analog, reference CMakeLists.txt:160,200-206,249-266); exercised
# by `make test-asan` (libasan preloaded, leak check off under CPython).
ASAN_LIB = build/librocjpeg_host_asan.so
ASAN_RT := $(shell $(CXX) -print-file-name=libasan.so)

capi: $(CAPI_LIB) $(CAPI_SAMPLE) $(CAPI_PERF)

native-asan: $(ASAN_LIB)

$(ASAN_LIB): csrc/rocjpeg_entropy.cpp
	@mkdir -p build
	$(CXX) -O1 -g -std=c++17 -shared -fPIC -pthread -fno-exceptions \
	    -fsanitize=address $< -o $@

# Host-only tests under ASAN: the XLA-driving suites can't run with libasan
# preloaded (jaxlib's statically linked C++ runtime trips the __cxa_throw
# interceptor); the native C++ paths are exactly what these suites cover.
test-asan: native-asan
	LD_PRELOAD=$(ASAN_RT) ASAN_OPTIONS=detect_leaks=0 \
	ROCJPEG_HOST_LIB=$(CURDIR)/$(ASAN_LIB) \
	python -m pytest tests/test_native.py tests/test_native_fuzz.py \
	    tests/test_parser.py tests/test_native_geometry.py -q

$(CAPI_LIB): csrc/rocjpeg_capi.cpp include/rocjpeg_tpu.h
	@mkdir -p build
	$(CXX) -O2 -std=c++17 -shared -fPIC -pthread $(PY_EMBED_CFLAGS) \
	    csrc/rocjpeg_capi.cpp -o $@ $(PY_EMBED_LDFLAGS)

$(CAPI_SAMPLE): csrc/samples/jpegdecode_c.cpp $(CAPI_LIB)
	$(CXX) -O2 -std=c++17 csrc/samples/jpegdecode_c.cpp -o $@ \
	    -Lbuild -lrocjpeg_tpu -Wl,-rpath,'$$ORIGIN'

$(CAPI_PERF): csrc/samples/jpegdecodeperf_c.cpp $(CAPI_LIB)
	$(CXX) -O2 -std=c++17 -pthread csrc/samples/jpegdecodeperf_c.cpp \
	    -o $@ -Lbuild -lrocjpeg_tpu -Wl,-rpath,'$$ORIGIN'

test: native
	python -m pytest tests/ -q

test-fast: native
	python -m pytest tests/ -q -x -k "not perf"

bench: native
	python bench.py

clean:
	rm -f $(NATIVE_LIB)
	rm -rf build dist *.egg-info
