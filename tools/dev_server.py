"""Boot the REST API + browser dashboard on a tiny random-init engine.

Development harness for driving the no-gradio web UI (serve/webui.py)
live on CPU without checkpoints:

    MISINFO_TPU_PLATFORM=cpu python tools/dev_server.py --port 8765
"""

import argparse
import threading


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=8765)
    p.add_argument("--vault", default=None)
    args = p.parse_args()

    import jax

    from misinfo_tpu.core.config import ForensicsConfig
    from misinfo_tpu.engine.forensics import MisinfoForensics
    from misinfo_tpu.models.detector import DetectorConfig, detector_init
    from misinfo_tpu.serve.api import ForensicsAPI, serve

    det = DetectorConfig.tiny()
    cfg = ForensicsConfig(verbose=False)
    cfg = cfg.replace(seq=cfg.seq.__class__(roberta_max_len=32,
                                            image_size=det.clip.image_size))
    if args.vault:
        import dataclasses
        cfg = cfg.replace(paths=dataclasses.replace(cfg.paths,
                                                    vault_path=args.vault))
    engine = MisinfoForensics(config=cfg, det_cfg=det,
                              params=detector_init(jax.random.PRNGKey(0), det))
    api = ForensicsAPI(engine=engine)
    httpd = serve(api, port=args.port)
    print(f"dev dashboard on http://127.0.0.1:{httpd.server_address[1]}",
          flush=True)
    threading.Event().wait()


if __name__ == "__main__":
    main()
