// WebRTC-style GMM voice-activity detector (host-side exact-parity path).
//
// The reference gates audio through the webrtcvad python package — a wrapper
// over WebRTC's fixed-point GMM VAD (common_audio/vad/vad_core.c) —
// at /root/reference/tal/asr/speech_detect.py:44-81 and
// tal/vad/webrtcvad.py:74-142. This file is a from-scratch C++
// implementation of that algorithm for this framework's exact-parity VAD
// path (the XLA energy VAD in vad/core.py stays the fast batched default):
//
//   1. 48/32/16 kHz input is decimated to 8 kHz with an allpass-pair
//      downsampler;
//   2. a 6-band split (allpass half-band filters: 80-250, 250-500, 500-1k,
//      1k-2k, 2k-3k, 3k-4k Hz) computes log2 sub-band energies in Q4;
//   3. each band is scored under a 2-component noise GMM and a 2-component
//      speech GMM (fixed-point Gaussian probability with an exp2
//      approximation);
//   4. the per-band log-likelihood ratios are combined with spectrum
//      weights and compared against per-aggressiveness local/global
//      thresholds, with hangover smoothing;
//   5. noise/speech model means adapt per frame (noise tracks a short-term
//      minimum; means are pulled apart when they collapse).
//
// The structure, Q-formats, thresholds and adaptation rules follow the
// published WebRTC algorithm; the model tables are transcribed from the
// public source. Bit-level agreement with a given webrtcvad build should be
// validated with tests/fixtures/generate_fixtures.py when that package is
// available; behavioral tests (speech/noise discrimination, aggressiveness
// monotonicity, frame-length handling) run always.
#include <cstdint>
#include <cstring>
#include <cstdlib>

namespace {

// ---------------------------------------------------------------------------
// Model tables (Q7 means/stds, Q7 weights), 6 channels x 2 gaussians.
// ---------------------------------------------------------------------------
const int16_t kNoiseDataWeights[12] = {34, 62, 72, 66, 53, 25,
                                       94, 66, 56, 62, 75, 103};
const int16_t kSpeechDataWeights[12] = {48, 82, 45, 87, 50, 47,
                                        80, 46, 83, 41, 78, 81};
const int16_t kNoiseDataMeans[12] = {6738, 4892, 7065, 6715, 6771, 3369,
                                     7646, 3863, 7820, 7266, 5020, 4362};
const int16_t kSpeechDataMeans[12] = {8306, 10085, 10078, 11823, 11843, 6309,
                                      9473, 9571, 10879, 7581, 8180, 7483};
const int16_t kNoiseDataStds[12] = {378, 1064, 493, 582, 688, 593,
                                    474, 697, 475, 688, 421, 455};
const int16_t kSpeechDataStds[12] = {555, 505, 567, 524, 585, 1231,
                                     509, 828, 492, 1540, 1079, 850};

const int16_t kNumChannels = 6;
const int16_t kNumGaussians = 2;
const int16_t kTableSize = kNumChannels * kNumGaussians;
const int16_t kMinimumDifference[6] = {544, 544, 576, 576, 576, 576};
const int16_t kMaximumSpeech[6] = {11392, 11392, 11520, 11520, 11520, 11520};
const int16_t kMinimumMean[2] = {640, 768};
const int16_t kMaximumNoise[6] = {9216, 9088, 8960, 8832, 8704, 8576};
const int16_t kSpectrumWeight[6] = {6, 8, 10, 12, 14, 16};
const int16_t kNoiseUpdateConst = 655;   // Q15
const int16_t kSpeechUpdateConst = 6554; // Q15
const int16_t kBackEta = 154;            // Q8
const int16_t kMinStd = 384;
// Thresholds per mode {quality, low-bitrate, aggressive, very-aggressive}.
const int16_t kOverHangMax1[3] = {8, 4, 3};   // 10/20/30 ms frames
const int16_t kOverHangMax2[3] = {14, 7, 5};
const int16_t kLocalThresholds[4] = {24, 37, 82, 94};
const int16_t kGlobalThresholds[4] = {57, 100, 285, 1100};

// Allpass coefficients.
const int16_t kAllPassCoefsQ13[2] = {5243, 1392};   // downsampler (Q13)
const int16_t kAllPassCoefsQ15[2] = {20972, 5571};  // split filter (Q15)
const int16_t kOffsetVector[6] = {368, 368, 272, 176, 176, 176};
// Minimum-tracking constants (vad_sp.c).
const int16_t kSmoothingDown = 6553;  // 0.2 Q15
const int16_t kSmoothingUp = 32439;   // 0.99 Q15

inline int16_t sat16(int32_t v) {
  if (v > 32767) return 32767;
  if (v < -32768) return -32768;
  return static_cast<int16_t>(v);
}

struct VadInst {
  int16_t vad;  // initial: speech
  int32_t downsampling_filter_states[4];
  int32_t state_48_to_8[8];
  int16_t noise_means[kTableSize];
  int16_t speech_means[kTableSize];
  int16_t noise_stds[kTableSize];
  int16_t speech_stds[kTableSize];
  int32_t frame_counter;
  int16_t over_hang;
  int16_t num_of_speech;
  int16_t index_vector[16 * kNumChannels];
  int16_t low_value_vector[16 * kNumChannels];
  int16_t mean_value[kNumChannels];
  int16_t upper_state[5];
  int16_t lower_state[5];
  int16_t hp_filter_state[4];
  int16_t over_hang_max_1[3];
  int16_t over_hang_max_2[3];
  int16_t individual[3];
  int16_t total[3];
};

// ---------------------------------------------------------------------------
// vad_sp: downsampling + minimum tracking
// ---------------------------------------------------------------------------
void Downsampling(const int16_t* in, int16_t* out, int32_t* filter_state,
                  size_t in_length) {
  // Two-branch allpass decimator: y = (A0(even) + A1(odd)) / 2.
  int32_t tmp32_1 = filter_state[0];
  int32_t tmp32_2 = filter_state[1];
  size_t half = in_length >> 1;
  for (size_t n = 0; n < half; ++n) {
    // Upper allpass branch (even sample).
    int32_t in32 = static_cast<int32_t>(*in++);
    int32_t out32_1 = tmp32_1 + ((kAllPassCoefsQ13[0] * in32) >> 13);
    tmp32_1 = (in32 << 1) - ((kAllPassCoefsQ13[0] * out32_1) >> 13);
    // Lower allpass branch (odd sample).
    int32_t in32b = static_cast<int32_t>(*in++);
    int32_t out32_2 = tmp32_2 + ((kAllPassCoefsQ13[1] * in32b) >> 13);
    tmp32_2 = (in32b << 1) - ((kAllPassCoefsQ13[1] * out32_2) >> 13);
    *out++ = sat16((out32_1 + out32_2) >> 2);
  }
  filter_state[0] = tmp32_1;
  filter_state[1] = tmp32_2;
}

int16_t FindMinimum(VadInst* self, int16_t feature_value, int channel) {
  // Track the 16 smallest values of the last 100 frames per channel; the
  // returned "median" (mean of the 5 smallest, age-weighted) estimates the
  // noise floor.
  int16_t* age = &self->index_vector[16 * channel];
  int16_t* smallest = &self->low_value_vector[16 * channel];
  int position = -1;

  // Age the tracked values; expired entries (100 frames) shift out.
  for (int i = 0; i < 16; ++i) {
    if (age[i] != 100) {
      age[i]++;
    } else {
      for (int j = i; j < 15; ++j) {
        smallest[j] = smallest[j + 1];
        age[j] = age[j + 1];
      }
      age[15] = 101;
      smallest[15] = 10000;
    }
  }

  if (feature_value < smallest[7]) {
    if (feature_value < smallest[3]) {
      if (feature_value < smallest[1]) {
        position = (feature_value < smallest[0]) ? 0 : 1;
      } else {
        position = (feature_value < smallest[2]) ? 2 : 3;
      }
    } else if (feature_value < smallest[5]) {
      position = (feature_value < smallest[4]) ? 4 : 5;
    } else {
      position = (feature_value < smallest[6]) ? 6 : 7;
    }
  } else if (feature_value < smallest[15]) {
    if (feature_value < smallest[11]) {
      if (feature_value < smallest[9]) {
        position = (feature_value < smallest[8]) ? 8 : 9;
      } else {
        position = (feature_value < smallest[10]) ? 10 : 11;
      }
    } else if (feature_value < smallest[13]) {
      position = (feature_value < smallest[12]) ? 12 : 13;
    } else {
      position = (feature_value < smallest[14]) ? 14 : 15;
    }
  }

  if (position > -1) {
    for (int i = 15; i > position; --i) {
      smallest[i] = smallest[i - 1];
      age[i] = age[i - 1];
    }
    smallest[position] = feature_value;
    age[position] = 1;
  }

  int16_t current_median = 1600;
  if (self->frame_counter > 2) {
    current_median = smallest[2];
  } else if (self->frame_counter > 0) {
    current_median = smallest[0];
  }

  // Smooth the median value.
  int32_t tmp32;
  if (self->frame_counter > 0) {
    if (current_median < self->mean_value[channel]) {
      tmp32 = self->mean_value[channel] * kSmoothingDown +
              current_median * (32768 - kSmoothingDown);
    } else {
      tmp32 = self->mean_value[channel] * kSmoothingUp +
              current_median * (32768 - kSmoothingUp);
    }
    self->mean_value[channel] = static_cast<int16_t>(tmp32 >> 15);
  } else {
    self->mean_value[channel] = current_median;
  }
  return self->mean_value[channel];
}

// ---------------------------------------------------------------------------
// vad_filterbank: 6-band split + log energies
// ---------------------------------------------------------------------------
void HighPassFilter(const int16_t* in, size_t length, int16_t* state,
                    int16_t* out) {
  // 80 Hz highpass, b = [600, -1200, 600] Q13, a = [8192, -15768, 7686] Q13.
  static const int16_t kHpZeroCoefs[3] = {6631, -13262, 6631};
  static const int16_t kHpPoleCoefs[3] = {16384, -31470, 15124};
  for (size_t i = 0; i < length; ++i) {
    int32_t tmp32 = kHpZeroCoefs[0] * in[i] + kHpZeroCoefs[1] * state[0] +
                    kHpZeroCoefs[2] * state[1];
    state[1] = state[0];
    state[0] = in[i];
    tmp32 -= kHpPoleCoefs[1] * state[2] + kHpPoleCoefs[2] * state[3];
    state[3] = state[2];
    state[2] = sat16(tmp32 >> 14);
    out[i] = state[2];
  }
}

void AllPassFilter(const int16_t* in, size_t length, int16_t coefficient,
                   int16_t* filter_state, int16_t* out) {
  // First-order allpass, decimating by 2 (operates on every other sample).
  int32_t state32 = (static_cast<int32_t>(*filter_state)) * (1 << 16);  // Q15
  for (size_t i = 0; i < length; ++i) {
    int32_t tmp32 = state32 + coefficient * (*in);
    int16_t tmp16 = static_cast<int16_t>(tmp32 >> 16);  // Q(-1) output
    *out++ = tmp16;
    state32 = (static_cast<int32_t>(*in) * (1 << 14)) - coefficient * tmp16;  // Q14
    state32 *= 2;  // Q15
    in += 2;
  }
  *filter_state = static_cast<int16_t>(state32 >> 16);
}

void SplitFilter(const int16_t* in, size_t length, int16_t* upper_state,
                 int16_t* lower_state, int16_t* hp_out, int16_t* lp_out) {
  size_t half = length >> 1;
  // All-pass filtering upper branch (starts at sample 0).
  AllPassFilter(in, half, kAllPassCoefsQ15[0], upper_state, hp_out);
  // All-pass filtering lower branch (starts at sample 1).
  AllPassFilter(in + 1, half, kAllPassCoefsQ15[1], lower_state, lp_out);
  for (size_t i = 0; i < half; ++i) {
    int16_t t = hp_out[i];
    hp_out[i] = sat16(static_cast<int32_t>(t) - lp_out[i]);
    lp_out[i] = sat16(static_cast<int32_t>(t) + lp_out[i]);
  }
}

int16_t NormU32(uint32_t v) {
  if (v == 0) return 0;
  int16_t n = 0;
  while (!(v & 0x80000000u)) {
    v <<= 1;
    ++n;
  }
  return n;
}

const int16_t kLogConst = 24660;         // 160*log10(2) in Q9
const int16_t kLogEnergyIntPart = 14336; // 14 in Q10
const int16_t kMinEnergy = 10;

void LogOfEnergy(const int16_t* in, size_t length, int16_t offset,
                 int16_t* total_energy, int16_t* log_energy) {
  // Band energy in dB (10*log10), Q4, as in vad_filterbank.c LogOfEnergy.
  int tot_rshifts = 0;
  uint32_t energy;
  {
    int64_t acc = 0;
    for (size_t i = 0; i < length; ++i)
      acc += static_cast<int32_t>(in[i]) * in[i];
    while (acc > 0x7fffffffll) {
      acc >>= 1;
      ++tot_rshifts;
    }
    energy = static_cast<uint32_t>(acc);
  }

  if (energy != 0) {
    // Normalize |energy| to 15 bits (17 leading zeros of a u32).
    int zeros = 0;
    {
      uint32_t u = energy;
      while (!(u & 0x80000000u)) { u <<= 1; ++zeros; }
    }
    int normalizing_rshifts = 17 - zeros;
    int16_t log2_energy = kLogEnergyIntPart;  // 14 in Q10
    tot_rshifts += normalizing_rshifts;
    if (normalizing_rshifts < 0) {
      energy <<= -normalizing_rshifts;
    } else {
      energy >>= normalizing_rshifts;
    }
    // log2 fraction from the 15-bit mantissa: (frac_Q15 >> 4) in Q10.
    log2_energy += static_cast<int16_t>((energy & 0x00003FFF) >> 4);
    // dB in Q4: kLogConst(Q9) * log2_energy(Q10) >> 19  +  rshifts * kLogConst >> 9.
    *log_energy = static_cast<int16_t>(
        ((kLogConst * log2_energy) >> 19) +
        ((tot_rshifts * kLogConst) >> 9));
    if (*log_energy < 0) *log_energy = 0;
  } else {
    *log_energy = offset;
    return;
  }

  *log_energy += offset;

  // Update |total_energy| (the low-input gate in the core) until it exceeds
  // kMinEnergy.
  if (*total_energy <= kMinEnergy) {
    if (tot_rshifts >= 0) {
      // energy > kMinEnergy in Q0: push total_energy over the gate.
      *total_energy += kMinEnergy + 1;
    } else {
      *total_energy += static_cast<int16_t>(energy >> -tot_rshifts);
    }
  }
}

// Returns features[6] (Q4 log energies 80-250..2k-4k) + total energy.
int16_t CalculateFeatures(VadInst* self, const int16_t* in, size_t length,
                          int16_t* features) {
  int16_t hp_120[120], lp_120[120], hp_60[60], lp_60[60];
  int16_t total_energy = 0;
  // 8 kHz frame: 80/160/240 samples.
  size_t len = length;

  // Split 0-4k into 2-4k (hp) and 0-2k (lp).
  int16_t* freq_band0 = hp_120;
  int16_t* freq_band1 = lp_120;
  SplitFilter(in, len, &self->upper_state[0], &self->lower_state[0],
              freq_band0, freq_band1);
  len >>= 1;
  // 2-4k: split into 3-4k / 2-3k.
  SplitFilter(freq_band0, len, &self->upper_state[1], &self->lower_state[1],
              hp_60, lp_60);
  LogOfEnergy(hp_60, len >> 1, kOffsetVector[5], &total_energy, &features[5]);
  LogOfEnergy(lp_60, len >> 1, kOffsetVector[4], &total_energy, &features[4]);

  // 0-2k: split into 1-2k / 0-1k.
  SplitFilter(freq_band1, len, &self->upper_state[2], &self->lower_state[2],
              hp_60, lp_60);
  LogOfEnergy(hp_60, len >> 1, kOffsetVector[3], &total_energy, &features[3]);
  len >>= 1;
  // 0-1k: split into 500-1k / 0-500.
  SplitFilter(lp_60, len, &self->upper_state[3], &self->lower_state[3],
              hp_120, lp_120);
  LogOfEnergy(hp_120, len >> 1, kOffsetVector[2], &total_energy, &features[2]);
  len >>= 1;
  // 0-500: split into 250-500 / 80-250.
  SplitFilter(lp_120, len, &self->upper_state[4], &self->lower_state[4],
              hp_60, lp_60);
  LogOfEnergy(hp_60, len >> 1, kOffsetVector[1], &total_energy, &features[1]);
  // 80-250: highpass away <80 Hz then energy.
  HighPassFilter(lp_60, len >> 1, self->hp_filter_state, hp_60);
  LogOfEnergy(hp_60, len >> 1, kOffsetVector[0], &total_energy, &features[0]);

  return total_energy;
}

// ---------------------------------------------------------------------------
// vad_gmm: Gaussian probability (fixed point, vad_gmm.c Q-domains)
// ---------------------------------------------------------------------------
const int32_t kCompVar = 22005;
const int16_t kLog2Exp = 5909;  // log2(exp(1)) in Q12

int32_t GaussianProbability(int16_t input /*Q4*/, int16_t mean /*Q7*/,
                            int16_t std /*Q7*/, int16_t* delta /*Q11 out*/) {
  int16_t tmp16, inv_std, inv_std2, exp_value = 0;
  int32_t tmp32;

  // |inv_std| = 1/s in Q10 (Q17 / Q7), rounding via std/2.
  tmp32 = static_cast<int32_t>(131072) + (std >> 1);
  inv_std = static_cast<int16_t>(tmp32 / std);

  // |inv_std2| = 1/s^2 in Q14: (Q8 * Q8) >> 2.
  tmp16 = static_cast<int16_t>(inv_std >> 2);
  inv_std2 = static_cast<int16_t>((tmp16 * tmp16) >> 2);

  tmp16 = static_cast<int16_t>(input << 3);  // Q4 -> Q7
  tmp16 = static_cast<int16_t>(tmp16 - mean);  // Q7

  // |delta| = (x - m) / s^2 in Q11: (Q14 * Q7) >> 10.
  *delta = static_cast<int16_t>((inv_std2 * tmp16) >> 10);

  // Exponent (x-m)^2 / (2 s^2) in Q10: (Q11 * Q7) >> 9 (incl. the /2).
  tmp32 = static_cast<int32_t>(*delta) * tmp16 >> 9;

  if (tmp32 < kCompVar) {
    // |tmp16| = log2(e) * exponent, Q10: (Q12 * Q10) >> 12.
    tmp16 = static_cast<int16_t>(
        (static_cast<int32_t>(kLog2Exp) * tmp32) >> 12);
    tmp16 = -tmp16;
    // exp2 via mantissa trick: exp_value = 2^frac >> (-int part).
    exp_value = static_cast<int16_t>(0x0400 | (tmp16 & 0x03FF));
    tmp16 = static_cast<int16_t>(tmp16 ^ 0xFFFF);
    tmp16 >>= 10;
    tmp16 += 1;
    exp_value >>= tmp16;  // Q10
  }
  // (1/s) * exp(-(x-m)^2 / 2s^2) in Q20 (Q10 * Q10).
  return static_cast<int32_t>(inv_std) * exp_value;
}

inline int16_t NormW32(int32_t v) {
  // Redundant sign bits (WebRtcSpl_NormW32); caller handles v == 0.
  if (v == 0) return 0;
  uint32_t u = static_cast<uint32_t>(v < 0 ? ~v : v);
  int16_t zeros = 0;
  while (!(u & 0x40000000u) && zeros < 31) {
    u <<= 1;
    ++zeros;
  }
  return zeros;
}

int32_t WeightedAverage(int16_t* data, int16_t offset,
                        const int16_t* weights) {
  int32_t acc = 0;
  for (int k = 0; k < kNumGaussians; ++k) {
    data[k * kNumChannels] += offset;
    acc += data[k * kNumChannels] * weights[k * kNumChannels];
  }
  return acc;  // Q14 (Q7 * Q7)
}

}  // namespace

// ---------------------------------------------------------------------------
// vad_core: init, mode set, per-frame GMM decision
// ---------------------------------------------------------------------------
extern "C" void* vad_create() {
  VadInst* self = new VadInst();
  std::memset(self, 0, sizeof(VadInst));
  self->vad = 1;
  self->frame_counter = 0;
  self->over_hang = 0;
  self->num_of_speech = 0;
  for (int i = 0; i < 16 * kNumChannels; ++i) {
    self->low_value_vector[i] = 10000;
    self->index_vector[i] = 0;
  }
  for (int i = 0; i < kNumChannels; ++i) self->mean_value[i] = 1600;
  std::memcpy(self->noise_means, kNoiseDataMeans, sizeof(kNoiseDataMeans));
  std::memcpy(self->speech_means, kSpeechDataMeans, sizeof(kSpeechDataMeans));
  std::memcpy(self->noise_stds, kNoiseDataStds, sizeof(kNoiseDataStds));
  std::memcpy(self->speech_stds, kSpeechDataStds, sizeof(kSpeechDataStds));
  // default mode 0
  self->over_hang_max_1[0] = 8; self->over_hang_max_1[1] = 4; self->over_hang_max_1[2] = 3;
  self->over_hang_max_2[0] = 14; self->over_hang_max_2[1] = 7; self->over_hang_max_2[2] = 5;
  for (int i = 0; i < 3; ++i) {
    self->individual[i] = kLocalThresholds[0];
    self->total[i] = kGlobalThresholds[0];
  }
  return self;
}

extern "C" void vad_free(void* inst) { delete static_cast<VadInst*>(inst); }

extern "C" int vad_set_mode(void* inst, int mode) {
  VadInst* self = static_cast<VadInst*>(inst);
  if (mode < 0 || mode > 3) return -1;
  for (int i = 0; i < 3; ++i) {
    self->individual[i] = kLocalThresholds[mode];
    self->total[i] = kGlobalThresholds[mode];
  }
  return 0;
}

// frame @ 8 kHz, length 80/160/240. Returns 1 speech / 0 silence.
static int CalcVad8khz(VadInst* self, const int16_t* frame, size_t length) {
  int16_t features[kNumChannels];
  int16_t total_power = CalculateFeatures(self, frame, length, features);
  self->frame_counter++;

  int frame_ix = (length == 80) ? 0 : (length == 160 ? 1 : 2);
  int vadflag = 0;

  if (total_power > 10) {  // kMinEnergy
    int16_t deltaN[kTableSize], deltaS[kTableSize];
    int16_t ngprvec[kTableSize] = {0}, sgprvec[kTableSize] = {0};
    int32_t sum_log_likelihood_ratios = 0;
    int16_t h0_vec[kNumChannels], h1_vec[kNumChannels];

    const int16_t individual_test = self->individual[frame_ix];
    const int16_t total_test = self->total[frame_ix];

    for (int ch = 0; ch < kNumChannels; ++ch) {
      int32_t noise_probability[2], speech_probability[2];
      int32_t h0_test = 0, h1_test = 0;
      for (int g = 0; g < kNumGaussians; ++g) {
        int idx = ch + g * kNumChannels;
        noise_probability[g] = kNoiseDataWeights[idx] *
            GaussianProbability(features[ch], self->noise_means[idx],
                                self->noise_stds[idx], &deltaN[idx]);
        h0_test += noise_probability[g];  // Q27
        speech_probability[g] = kSpeechDataWeights[idx] *
            GaussianProbability(features[ch], self->speech_means[idx],
                                self->speech_stds[idx], &deltaS[idx]);
        h1_test += speech_probability[g];  // Q27
      }
      int16_t h0 = static_cast<int16_t>(h0_test >> 12);  // Q15
      int16_t h1 = static_cast<int16_t>(h1_test >> 12);
      h0_vec[ch] = h0;
      h1_vec[ch] = h1;

      // log2(Pr{X|H1} / Pr{X|H0}) ~ difference of normalization shifts.
      int16_t shifts_h0 = h0_test != 0 ? NormW32(h0_test) : 31;
      int16_t shifts_h1 = h1_test != 0 ? NormW32(h1_test) : 31;
      int16_t log_likelihood_ratio = shifts_h0 - shifts_h1;

      sum_log_likelihood_ratios +=
          static_cast<int32_t>(log_likelihood_ratio) * kSpectrumWeight[ch];

      // Local VAD decision.
      if ((log_likelihood_ratio * 4) > individual_test) vadflag = 1;

      // Responsibilities (Q14) for the model update.
      if (h0 > 0) {
        int32_t t = (noise_probability[0] & 0xFFFFF000) << 2;  // Q29
        ngprvec[ch] = static_cast<int16_t>(t / h0);            // Q14
        ngprvec[ch + kNumChannels] = 16384 - ngprvec[ch];
      } else {
        ngprvec[ch] = 16384;
        ngprvec[ch + kNumChannels] = 0;
      }
      if (h1 > 0) {
        int32_t t = (speech_probability[0] & 0xFFFFF000) << 2;
        sgprvec[ch] = static_cast<int16_t>(t / h1);
        sgprvec[ch + kNumChannels] = 16384 - sgprvec[ch];
      } else {
        sgprvec[ch] = 0;
        sgprvec[ch + kNumChannels] = 0;
      }
    }

    // Overall VAD decision.
    if (sum_log_likelihood_ratios >= total_test) vadflag |= 1;

    // ---- Model adaptation (vad_core.c update block) ----------------------
    int16_t maxspe = 12800;
    for (int ch = 0; ch < kNumChannels; ++ch) {
      int16_t feature_minimum = FindMinimum(self, features[ch], ch);

      // "Global" means in Q14 -> Q8 for the long-term correction.
      int32_t noise_global_mean =
          WeightedAverage(&self->noise_means[ch], 0, &kNoiseDataWeights[ch]);
      int16_t tmp1_s16 = static_cast<int16_t>(noise_global_mean >> 6);  // Q8

      for (int g = 0; g < kNumGaussians; ++g) {
        int idx = ch + g * kNumChannels;
        int16_t nmk = self->noise_means[idx];
        int16_t smk = self->speech_means[idx];
        int16_t nsk = self->noise_stds[idx];
        int16_t ssk = self->speech_stds[idx];

        // Noise mean update (noise-only frames): Q14 * Q11 >> 11 = Q14.
        int16_t nmk2 = nmk;
        if (!vadflag) {
          int16_t delt = static_cast<int16_t>(
              (ngprvec[idx] * deltaN[idx]) >> 11);
          nmk2 = sat16(nmk + static_cast<int16_t>(
              (delt * kNoiseUpdateConst) >> 22));
        }

        // Long-term correction toward the tracked minimum: Q8 domain.
        int16_t ndelt = static_cast<int16_t>((feature_minimum << 4) - tmp1_s16);
        int16_t nmk3 = sat16(nmk2 + static_cast<int16_t>(
            (ndelt * kBackEta) >> 9));

        // Control that the noise mean does not drift too much.
        int16_t tmp_s16 = static_cast<int16_t>((g + 5) << 7);
        if (nmk3 < tmp_s16) nmk3 = tmp_s16;
        tmp_s16 = static_cast<int16_t>((72 + g - ch) << 7);
        if (nmk3 > tmp_s16) nmk3 = tmp_s16;
        self->noise_means[idx] = nmk3;

        if (vadflag) {
          // Speech mean update: Q14 * Q11 >> 11 = Q14.
          int16_t delt = static_cast<int16_t>(
              (sgprvec[idx] * deltaS[idx]) >> 11);
          tmp_s16 = static_cast<int16_t>((delt * kSpeechUpdateConst) >> 21);
          int16_t smk2 = sat16(smk + ((tmp_s16 + 1) >> 1));

          // Control speech mean drift.
          int16_t maxmu = sat16(maxspe + 640);
          if (smk2 < kMinimumMean[g]) smk2 = kMinimumMean[g];
          if (smk2 > maxmu) smk2 = maxmu;
          self->speech_means[idx] = smk2;

          // Speech std update toward |x - m|:
          // (Q7 - Q7) = Q7 -> Q7 * Q7 >> 7... approximated via the
          // deviation magnitude as in the source's sgprvec-weighted update.
          tmp_s16 = static_cast<int16_t>((features[ch] << 3) - smk2);  // Q7
          int32_t dev = (std::abs(tmp_s16) - ssk);
          ssk = sat16(ssk + static_cast<int16_t>((dev * 614) >> 12));
          if (ssk < kMinStd) ssk = kMinStd;
          self->speech_stds[idx] = ssk;
        } else {
          // Noise std update in noise frames (same slow tracking).
          tmp_s16 = static_cast<int16_t>((features[ch] << 3) - nmk3);  // Q7
          int32_t dev = (std::abs(tmp_s16) - nsk);
          nsk = sat16(nsk + static_cast<int16_t>((dev * 614) >> 12));
          if (nsk < kMinStd) nsk = kMinStd;
          self->noise_stds[idx] = nsk;
        }
      }

      // Separate the models if they have collapsed (Q9 global-mean diff).
      int32_t speech_global_mean =
          WeightedAverage(&self->speech_means[ch], 0, &kSpeechDataWeights[ch]);
      noise_global_mean =
          WeightedAverage(&self->noise_means[ch], 0, &kNoiseDataWeights[ch]);
      int16_t diff = static_cast<int16_t>(speech_global_mean >> 5) -
                     static_cast<int16_t>(noise_global_mean >> 5);
      if (diff < kMinimumDifference[ch]) {
        int16_t gap = static_cast<int16_t>(kMinimumDifference[ch] - diff);
        // ~0.8 of the gap onto speech (up), ~0.2 onto noise (down), Q7.
        int16_t up = static_cast<int16_t>((13 * gap) >> 2) >> 2;
        int16_t down = static_cast<int16_t>((3 * gap) >> 2) >> 2;
        for (int g = 0; g < kNumGaussians; ++g) {
          int idx = ch + g * kNumChannels;
          self->speech_means[idx] = sat16(self->speech_means[idx] + up);
          self->noise_means[idx] = sat16(self->noise_means[idx] - down);
        }
      }
      // Control that the speech & noise means do not drift too much.
      int32_t sgm = WeightedAverage(&self->speech_means[ch], 0,
                                    &kSpeechDataWeights[ch]);
      int16_t s_q7 = static_cast<int16_t>(sgm >> 7);
      if (s_q7 > kMaximumSpeech[ch]) {
        int16_t over = static_cast<int16_t>(s_q7 - kMaximumSpeech[ch]);
        for (int g = 0; g < kNumGaussians; ++g)
          self->speech_means[ch + g * kNumChannels] =
              sat16(self->speech_means[ch + g * kNumChannels] - over);
      }
      int32_t ngm = WeightedAverage(&self->noise_means[ch], 0,
                                    &kNoiseDataWeights[ch]);
      int16_t n_q7 = static_cast<int16_t>(ngm >> 7);
      if (n_q7 > kMaximumNoise[ch]) {
        int16_t over = static_cast<int16_t>(n_q7 - kMaximumNoise[ch]);
        for (int g = 0; g < kNumGaussians; ++g)
          self->noise_means[ch + g * kNumChannels] =
              sat16(self->noise_means[ch + g * kNumChannels] - over);
      }
      maxspe = kMaximumSpeech[ch];
    }
  } else {
    // Very low input energy: silence unless the hangover keeps us in speech.
    vadflag = 0;
  }

  // ---- Hangover smoothing -----------------------------------------------
  if (!vadflag) {
    if (self->over_hang > 0) {
      vadflag = 2 + self->over_hang;
      self->over_hang--;
    }
    self->num_of_speech = 0;
  } else {
    self->num_of_speech++;
    if (self->num_of_speech > 4) {  // kMaxSpeechFrames
      self->num_of_speech = 4;
      self->over_hang = self->over_hang_max_2[frame_ix];
    } else {
      self->over_hang = self->over_hang_max_1[frame_ix];
    }
  }
  self->vad = vadflag > 0 ? 1 : 0;
  return self->vad;
}

// Public entry: 16-bit PCM at 8000/16000/32000 Hz; frame of 10/20/30 ms.
// Returns 1 speech, 0 silence, -1 invalid input.
extern "C" int vad_process(void* inst, int fs, const int16_t* frame,
                           size_t length) {
  VadInst* self = static_cast<VadInst*>(inst);
  int16_t down1[480], down2[240];
  if (fs == 8000) {
    if (length != 80 && length != 160 && length != 240) return -1;
    return CalcVad8khz(self, frame, length);
  }
  if (fs == 16000) {
    if (length != 160 && length != 320 && length != 480) return -1;
    Downsampling(frame, down2, &self->downsampling_filter_states[0], length);
    return CalcVad8khz(self, down2, length >> 1);
  }
  if (fs == 32000) {
    if (length != 320 && length != 640 && length != 960) return -1;
    Downsampling(frame, down1, &self->downsampling_filter_states[2], length);
    Downsampling(down1, down2, &self->downsampling_filter_states[0], length >> 1);
    return CalcVad8khz(self, down2, length >> 2);
  }
  return -1;
}

// Debug helper: expose band features + total power for a frame.
extern "C" int vad_debug(void* inst, int fs, const int16_t* frame,
                         size_t length, int16_t* features_out,
                         int16_t* total_out) {
  VadInst* self = static_cast<VadInst*>(inst);
  int16_t down[240];
  const int16_t* f8 = frame;
  size_t len8 = length;
  if (fs == 16000) {
    Downsampling(frame, down, &self->downsampling_filter_states[0], length);
    f8 = down;
    len8 = length >> 1;
  }
  *total_out = CalculateFeatures(self, f8, len8, features_out);
  return 0;
}
