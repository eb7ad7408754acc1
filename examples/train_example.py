"""Training walkthrough (mirrors the reference's train_example.ipynb).

Runs a short training session on a synthetic CUB-format dataset, then plots
the loss curves. Swap `make_synthetic_cub` for a real CUB data directory to
reproduce the reference's full run (256px, batch 24, 600 epochs).
"""
import os
import tempfile

from gan_codes_tpu.data.synthetic import make_synthetic_cub
from gan_codes_tpu.train_entry import train
from gan_codes_tpu.utils.plotting import plot_losses, plot_metrics


def main(work: str = None):
    work = work or tempfile.mkdtemp(prefix="dfgan_example_")
    data_dir = os.path.join(work, "data")
    info = make_synthetic_cub(data_dir, n_train=8, n_test=4, image_size=48)
    print(f"Synthetic dataset: {info}")

    histories = train(
        data_path=data_dir,
        encoder_weights_path=None,          # random-init text encoder
        image_save_path=os.path.join(work, "gen_images"),
        gen_path_save=os.path.join(work, "gen_weights"),
        image_size=32, batch_size=4, num_epochs=2,
    )

    plot_losses(histories["g_losses"], histories["d_losses"],
                histories["d_gp_losses"],
                path_save=os.path.join(work, "losses.png"))
    plot_metrics(histories["fid_scores"], histories["is_scores"],
                 path_save=os.path.join(work, "metrics.png"))
    print(f"Artifacts in {work}")
    return work


if __name__ == "__main__":
    main()
