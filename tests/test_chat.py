"""Chat template tests (model: reference tests/test-chat-template.cpp)."""

from llm_tpu.server.chat import TEMPLATES, apply_template, detect_template

MSGS = [
    {"role": "system", "content": "be good"},
    {"role": "user", "content": "hi"},
    {"role": "assistant", "content": "hello"},
    {"role": "user", "content": "bye?"},
]


def test_chatml():
    out = TEMPLATES["chatml"](MSGS)
    assert out.startswith("<|im_start|>system\nbe good<|im_end|>")
    assert out.endswith("<|im_start|>assistant\n")


def test_llama2_folds_system():
    out = TEMPLATES["llama2"](MSGS)
    assert out.startswith("[INST] <<SYS>>\nbe good\n<</SYS>>\n\nhi [/INST]")
    assert "hello" in out


def test_llama3():
    out = TEMPLATES["llama3"](MSGS)
    assert "<|start_header_id|>user<|end_header_id|>\n\nhi<|eot_id|>" in out
    assert out.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")


def test_gemma_maps_assistant_to_model():
    out = TEMPLATES["gemma"](MSGS)
    assert "<start_of_turn>model\nhello<end_of_turn>" in out


def test_detect():
    assert detect_template("{{ '<|im_start|>' }}") == "chatml"
    assert detect_template("<|start_header_id|>...") == "llama3"
    assert detect_template("<start_of_turn>") == "gemma"
    assert detect_template("[INST] something") == "llama2"
    assert detect_template("") == "chatml"


def test_apply_jinja_source():
    src = "{% for m in messages %}{{ m.role }}:{{ m.content }};{% endfor %}"
    out = apply_template(src, MSGS)
    assert out.startswith("system:be good;user:hi;")


def test_apply_named():
    assert apply_template("phi3", MSGS).endswith("<|assistant|>\n")
