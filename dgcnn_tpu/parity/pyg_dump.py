"""Reference-side activation dumper — run in a pinned PyTorch-Geometric
environment (NOT this one; torch_geometric is not installed here).

Given a weight/activation npz produced by
`python -m dgcnn_tpu.parity.harness dump`, loads the converted torch
weights into the reference architecture, runs the same first-N-graphs
batch through PyG, and writes a dump comparable with
`python -m dgcnn_tpu.parity.harness compare`.

Usage (inside the PyG environment, reference repo layout on PYTHONPATH):
    python pyg_dump.py --data_type MUTAG --weights ours.npz --out pyg.npz
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_type", default="MUTAG")
    p.add_argument("--weights", required=True, help="npz from harness dump")
    p.add_argument("--out", required=True)
    p.add_argument("--num_graphs", type=int, default=50)
    p.add_argument("--data_root", default="data")
    args = p.parse_args(argv)

    import torch
    import torch.nn.functional as F
    from torch_geometric.datasets import TUDataset
    from torch_geometric.loader import DataLoader
    from torch_geometric.nn import GCNConv, SortAggregation
    from torch_geometric.utils import remove_self_loops

    # Indegree pre-transform equivalent (reference utils.py:18-33)
    from torch_geometric.utils import degree

    class Indegree:
        def __call__(self, data):
            col, x = data.edge_index[1], data.x
            deg = degree(col, data.num_nodes)
            deg = deg / deg.max()
            deg = deg.view(-1, 1)
            if x is not None:
                data.x = torch.cat([x.view(-1, 1) if x.dim() == 1 else x,
                                    deg.to(x.dtype)], dim=-1)
            else:
                data.x = deg
            return data

    ds = TUDataset(f"{args.data_root}/{args.data_type}", args.data_type,
                   pre_transform=Indegree(), use_node_attr=True)

    with np.load(args.weights) as z:
        state = {k[2:]: torch.tensor(z[k]) for k in z.files if k.startswith("w_")}

    # rebuild the reference architecture (reference model.py:9-45)
    class Model(torch.nn.Module):
        def __init__(self, f_in, c_out):
            super().__init__()
            self.conv1 = GCNConv(f_in, 32)
            self.conv2 = GCNConv(32, 32)
            self.conv3 = GCNConv(32, 32)
            self.conv4 = GCNConv(32, 1)
            self.sort_pool = SortAggregation(k=30)
            self.conv5 = torch.nn.Conv1d(1, 16, 97, 97)
            self.conv6 = torch.nn.Conv1d(16, 32, 5, 1)
            self.pool = torch.nn.MaxPool1d(2, 2)
            self.classifier_1 = torch.nn.Linear(352, 128)
            self.classifier_2 = torch.nn.Linear(128, c_out)

        def forward(self, data):
            x, edge_index, batch = data.x, data.edge_index, data.batch
            edge_index, _ = remove_self_loops(edge_index)
            acts = {}
            x1 = torch.tanh(self.conv1(x, edge_index)); acts["gcn1"] = x1
            x2 = torch.tanh(self.conv2(x1, edge_index)); acts["gcn2"] = x2
            x3 = torch.tanh(self.conv3(x2, edge_index)); acts["gcn3"] = x3
            x4 = torch.tanh(self.conv4(x3, edge_index)); acts["gcn4"] = x4
            x = torch.cat([x1, x2, x3, x4], dim=-1)
            x = self.sort_pool(x, batch)
            acts["sort_pool"] = x.view(x.size(0), 30, 97)
            x = x.view(x.size(0), 1, x.size(-1))
            x = torch.relu(self.conv5(x))
            x = self.pool(x)
            x = torch.relu(self.conv6(x))
            x = x.view(x.size(0), -1)
            out = torch.relu(self.classifier_1(x))
            acts["log_probs"] = F.log_softmax(self.classifier_2(out), dim=-1)
            return acts

    model = Model(ds.num_features, ds.num_classes)
    missing = model.load_state_dict(state, strict=False)
    assert not missing.missing_keys, missing

    subset = ds[list(range(min(args.num_graphs, len(ds))))]
    loader = DataLoader(subset, batch_size=len(subset), shuffle=False)
    model.eval()
    with torch.no_grad():
        acts = model(next(iter(loader)))
    np.savez(args.out, **{f"act_{k}": v.numpy() for k, v in acts.items()})
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
