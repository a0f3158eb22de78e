"""Yinyang k-means driver (reference: kmeans_cuda_yy, src/kmeans.cu:1028-1263).

Phase plan (SURVEY.md §7.5):
1. Lloyd draft until reassignments < YINYANG_DRAFT_REASSIGNMENTS (11%).
2. Cluster the centroids themselves into G groups (recursive k-means).
3. Iterate with upper/lower drift bounds, global filter, and a compacted
   local filter that only pays for samples that might change.

NOTE: the filtered main loop lands in the next milestone; this driver
currently runs the draft phase and finishes with plain Lloyd so the public
API is complete end-to-end.  Results are identical to Lloyd (the filters
only ever skip provably-unchanged work).
"""

from kmcuda_tpu import config
from kmcuda_tpu.models import lloyd as L


def run(problem, centroids, assignments, tolerance, groups,
        max_iterations=None, key=None):
    p = problem
    p.logger.debug("yinyang: draft Lloyd until < %.0f%% reassignments"
                   % (config.YINYANG_DRAFT_REASSIGNMENTS * 100))
    centroids, assignments, best, it0, changed = L.run(
        p, centroids, assignments, config.YINYANG_DRAFT_REASSIGNMENTS,
        max_iterations=max_iterations)
    if changed <= tolerance * p.n:
        return centroids, assignments, best, it0
    centroids, assignments, best, it1, _ = L.run(
        p, centroids, assignments, tolerance,
        max_iterations=None if max_iterations is None
        else max_iterations - it0,
        iter_offset=it0)
    return centroids, assignments, best, it0 + it1
