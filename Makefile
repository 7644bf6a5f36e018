# Convenience targets (capability parity with the reference Makefile:1-87 —
# docker/visdom replaced by the native toolchain + TSV metrics).

DATASETS_ROOT ?= datasets
MODELS_DIR ?= saved_models
RUN_ID ?= default

.PHONY: test test-all bench bench-all bench-train bench-native \
        bench-quality bench-streaming native selftest demo \
        preprocess_encoder preprocess_synth_audio preprocess_synth_embeds \
        preprocess_synth_alignments preprocess_vocoder \
        train_encoder train_synthesizer train_forward train_vocoder

# Quick gate (~3.5 min on the 1-core CI box, faster with a warm JAX
# compilation cache): everything except slow-marked suites (lifecycle,
# learning, training, native, pipeline, ref-oracle parity, heavy
# compiles). Full gate: make test-all (~14 min).
test:
	python -m pytest tests/ -x -q -m "not slow"

test-all:
	python -m pytest tests/ -x -q

bench:
	python bench.py

bench-all:
	python bench_all.py

bench-train:
	python bench_train.py

bench-native:
	python bench_native.py

bench-quality:
	python bench_quality.py

bench-streaming:
	python bench_streaming.py

native:
	rtvc_tpu/native/build.sh

selftest:
	python demo_cli.py --selftest

demo:
	python demo_cli.py

preprocess_encoder:
	python encoder_preprocess.py $(DATASETS_ROOT)

preprocess_synth_audio:
	python synthesizer_preprocess_audio.py $(DATASETS_ROOT)

preprocess_synth_embeds:
	python synthesizer_preprocess_embeds.py $(DATASETS_ROOT)/SV2TTS/synthesizer

preprocess_synth_alignments:
	python synthesizer_preprocess_alignments.py $(DATASETS_ROOT)/SV2TTS/synthesizer

preprocess_vocoder:
	python vocoder_preprocess.py $(DATASETS_ROOT)

train_encoder:
	python encoder_train.py $(RUN_ID) $(DATASETS_ROOT)/SV2TTS/encoder -m $(MODELS_DIR)

train_synthesizer:
	python synthesizer_train.py $(RUN_ID) tacotron $(DATASETS_ROOT)/SV2TTS/synthesizer -m $(MODELS_DIR)

train_forward:
	python synthesizer_train.py $(RUN_ID) forward-tacotron $(DATASETS_ROOT)/SV2TTS/synthesizer -m $(MODELS_DIR)

train_vocoder:
	python vocoder_train.py $(RUN_ID) fatchord-wavernn $(DATASETS_ROOT) -m $(MODELS_DIR)
