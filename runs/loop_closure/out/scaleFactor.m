function [x] = scaleFactor()
x = [1.4575898225052213];
end
