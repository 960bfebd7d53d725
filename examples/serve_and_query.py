"""Spawn the OpenAI-compatible server on a tiny model and query it."""

import json
import os
import subprocess
import sys
import time
import urllib.request

EXAMPLES = os.path.dirname(os.path.abspath(__file__))
ENV = {**os.environ, "PYTHONPATH": os.path.dirname(EXAMPLES)}


def main():
    subprocess.run([sys.executable, "quickstart.py"], check=True,
                   cwd=EXAMPLES, env=ENV)
    srv = subprocess.Popen(
        [sys.executable, "-m", "llm_tpu.server.app", "-m",
         "/tmp/example_q8.gguf", "--port", "8080", "-np", "2"], env=ENV)
    try:
        for _ in range(120):
            try:
                urllib.request.urlopen("http://127.0.0.1:8080/health",
                                       timeout=2)
                break
            except Exception:
                time.sleep(1)
        body = json.dumps({"prompt": [1, 42, 7], "n_predict": 8,
                           "temperature": 0}).encode()
        req = urllib.request.Request(
            "http://127.0.0.1:8080/completion", data=body,
            headers={"Content-Type": "application/json"})
        print(urllib.request.urlopen(req, timeout=300).read().decode())
    finally:
        srv.terminate()
        srv.wait()


if __name__ == "__main__":
    main()
