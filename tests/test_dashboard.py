"""Live dashboard (visdom replacement): serves metrics TSVs + artifact
gallery over HTTP from a run dir."""
import json
import urllib.request

import numpy as np

from rtvc_tpu.utils.dashboard import serve
from rtvc_tpu.utils.metrics import MetricsLogger


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=10) as r:
        return r.status, r.read(), r.headers.get("Content-Type", "")


def test_dashboard_serves_metrics_and_artifacts(tmp_path):
    logger = MetricsLogger(tmp_path / "metrics.tsv")
    for step in range(30):
        logger.log(step, {"loss": 3.0 * np.exp(-step / 10), "lr": 1e-3})
    # a fake artifact plot
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    ax.plot([0, 1], [1, 0])
    fig.savefig(tmp_path / "attention_10.png")
    plt.close(fig)

    server = serve(tmp_path, port=0, background=True)
    try:
        port = server.server_address[1]
        status, body, ctype = _get(port, "/")
        assert status == 200 and b"dashboard" in body and "html" in ctype

        status, body, _ = _get(port, "/data.json")
        data = json.loads(body)
        assert set(data["metrics"]) == {"loss", "lr"}
        pts = data["metrics"]["loss"]
        assert pts[0][0] == 0 and pts[-1][0] == 29
        assert abs(pts[0][1] - 3.0) < 1e-6
        assert data["artifacts"] == ["attention_10.png"]

        status, body, ctype = _get(port, "/art/attention_10.png")
        assert status == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"

        # path traversal is rejected
        import urllib.error

        try:
            _get(port, "/art/../metrics.tsv")
            hit = True
        except urllib.error.HTTPError as e:
            hit = e.code == 404
        assert hit is True
    finally:
        server.shutdown()
