import json, os, sys, time
sys.path.insert(0, "/root/repo")
os.chdir("/tmp/release2")
from dgcnn_tpu.config import Config
from dgcnn_tpu.train.cv import run_cross_validation
t0 = time.perf_counter()
cfg = Config(data_type="DD", data_root="/tmp/release/data",
             epochs_dir="/tmp/release2/epochs", statistics_dir="/tmp/release2/statistics",
             checkpoint_resume=True)
r = run_cross_validation(cfg, allow_synthetic=True)
wall = time.perf_counter() - t0
with open("/tmp/release2/summary.jsonl", "a") as f:
    f.write(json.dumps({"dataset": "DD", "wall_s": round(wall,1),
                        "test_acc_mean": r["test_accuracy_mean"],
                        "test_acc_std": r["test_accuracy_std"],
                        "train_acc_mean": r["train_accuracy_mean"]}) + "\n")
print("DD done", round(wall,1), "s")
