# R binding for libKMTPU, mirroring the reference binding's contract
# (reference src/r.cc):
#  - `samples` may be one numeric matrix or a list of matrices which are
#    rbind-ed (r.cc:80-139) — the list form exists because a single R matrix
#    cannot exceed 2^31-1 elements;
#  - doubles are converted to float32 (r.cc:121-139);
#  - assignments are returned 1-based (r.cc:303-316);
#  - the result is a named list(centroids, assignments[, average_distance])
#    (r.cc:317-332); knn returns a 1-based integer matrix (r.cc:406-416).
#
# Implementation: the kmcuda_tpu Python package via reticulate.  (The
# reference compiles its R binding into the CUDA shared library; the TPU
# runtime is reachable only through XLA's Python frontend, so the R layer
# marshals to it.  A C-level route via libkmtpu.so/.External is possible
# but would embed the same interpreter.)

.kmtpu_env <- new.env(parent = emptyenv())

.kmtpu <- function() {
  if (is.null(.kmtpu_env$mod)) {
    .kmtpu_env$mod <- reticulate::import("kmcuda_tpu", delay_load = FALSE)
  }
  .kmtpu_env$mod
}

.flatten_samples <- function(samples) {
  if (is.list(samples)) {
    # rbind path (r.cc:80-139): total row count may exceed a single
    # matrix's limits
    for (m in samples) {
      if (!is.matrix(m)) stop("samples list members must be matrices")
    }
    samples <- do.call(rbind, samples)
  }
  if (!is.matrix(samples)) stop("samples must be a matrix or list of matrices")
  storage.mode(samples) <- "double"
  samples
}

#' K-means clustering on TPU.
#'
#' @param samples numeric matrix (samples x features) or list of matrices.
#' @param clusters number of clusters.
#' @param tolerance stop when fewer than this fraction reassigns.
#' @param init "k-means++", "random", "afkmc2" or a matrix of centroids.
#' @param yinyang_t Yinyang group fraction; 0 disables Yinyang.
#' @param metric "L2" or "cos".
#' @param average_distance also return the mean sample-centroid distance.
#' @param seed integer random seed.
#' @param device device bitmask (0 = all).
#' @param verbosity 0 silent, 1 progress, 2 debug.
#' @return list(centroids, assignments[, average_distance]); assignments
#'         are 1-based.
kmeans_tpu <- function(samples, clusters, tolerance = 0.01,
                       init = "k-means++", yinyang_t = 0.1, metric = "L2",
                       average_distance = FALSE, seed = NULL, device = 0L,
                       verbosity = 0L) {
  mod <- .kmtpu()
  x <- .flatten_samples(samples)
  np <- reticulate::import("numpy")
  x32 <- np$asarray(x, dtype = "float32")
  if (is.matrix(init)) {
    init <- np$asarray(init, dtype = "float32")
  }
  res <- mod$kmeans_tpu(
    x32, as.integer(clusters), tolerance = tolerance, init = init,
    yinyang_t = yinyang_t, metric = metric,
    average_distance = average_distance,
    seed = if (is.null(seed)) NULL else as.integer(seed),
    device = as.integer(device), verbosity = as.integer(verbosity))
  out <- list(centroids = res[[1]],
              # 1-based indices, like the reference (r.cc:303-316)
              assignments = as.integer(res[[2]]) + 1L)
  if (average_distance) {
    out$average_distance <- res[[3]]
  }
  out
}

#' Exact k-nearest-neighbors using k-means structure for pruning.
#'
#' @return integer matrix (samples x k) of 1-based neighbor indices sorted
#'         by ascending distance, excluding the sample itself.
knn_tpu <- function(k, samples, centroids, assignments, metric = "L2",
                    device = 0L, verbosity = 0L) {
  mod <- .kmtpu()
  x <- .flatten_samples(samples)
  np <- reticulate::import("numpy")
  nb <- mod$knn_tpu(
    as.integer(k), np$asarray(x, dtype = "float32"),
    np$asarray(centroids, dtype = "float32"),
    np$asarray(as.integer(assignments) - 1L, dtype = "uint32"),
    metric = metric, device = as.integer(device),
    verbosity = as.integer(verbosity))
  matrix(as.integer(nb) + 1L, nrow = nrow(x), byrow = FALSE)
}

# kmcuda-compatible names (the reference R binding exports kmeans_cuda /
# knn_cuda, r.cc:177-181)
kmeans_cuda <- kmeans_tpu
knn_cuda <- knn_tpu
