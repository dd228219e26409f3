"""Host pipeline components: world state (Frame/MapPoint/MapManager) and the
SLAM stages (FrontEnd/Mapper/Estimator/SlamManager). The host owns mutation
ordering and map bookkeeping; all heavy numerics dispatch to the batched
device kernels in slamtpu.ops."""
